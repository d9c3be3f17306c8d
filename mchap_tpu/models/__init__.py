from mchap_tpu.models import calling  # noqa: F401
