from mchap_tpu.ops import exact, likelihood, priors  # noqa: F401
