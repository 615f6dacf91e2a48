from .ops import batched_sum, divide_by_linear, poly_eval
