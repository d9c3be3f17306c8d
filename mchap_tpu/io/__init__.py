from mchap_tpu.io import util  # noqa: F401
