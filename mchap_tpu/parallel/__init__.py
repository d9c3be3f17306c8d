from mchap_tpu.parallel import mesh  # noqa: F401
