from .ntt import (
    ntt, intt, powers, coset_lde, poly_eval, field_sum, bit_reverse_perm,
)

__all__ = [
    "ntt", "intt", "powers", "coset_lde", "poly_eval", "field_sum",
    "bit_reverse_perm",
]
