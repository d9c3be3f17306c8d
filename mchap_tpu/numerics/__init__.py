from mchap_tpu.numerics import combinadics, dosage, logprob  # noqa: F401
