from casapose_tpu.core.numerics import divide_no_nan, multiply_no_nan, safe_l2_normalize

__all__ = ["divide_no_nan", "multiply_no_nan", "safe_l2_normalize"]
