from .ntt import (
    ntt, intt, powers, powers_host, coset_lde, coset_eval_from_coeffs,
    poly_eval, field_sum, bit_reverse_perm,
)

__all__ = [
    "ntt", "intt", "powers", "powers_host", "coset_lde", "coset_eval_from_coeffs",
    "poly_eval", "field_sum", "bit_reverse_perm",
]
