from mchap_tpu.utils import timing  # noqa: F401
