from .expr import (
    Expr, X, Constant, Trace, Challenge, Hint, Periodic, Pow, Inv,
    trace_arguments, evaluate_lde, evaluate_scalar, constant,
)

__all__ = [
    "Expr", "X", "Constant", "Trace", "Challenge", "Hint", "Periodic",
    "Pow", "Inv", "trace_arguments", "evaluate_lde", "evaluate_scalar",
    "constant",
]
