from mchap_tpu.encoding import character, integer  # noqa: F401
