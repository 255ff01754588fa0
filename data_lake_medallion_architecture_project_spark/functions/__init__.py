from .money import dec_avg, dec_sum, oracle_dec_avg, oracle_dec_sum  # noqa: F401
