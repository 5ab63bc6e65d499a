"""The STARK verifier (host-side python-int math; mirrors SURVEY.md §3.2).

Replays the Fiat-Shamir transcript, checks the OODS constraint identity
against the claimed out-of-domain openings, verifies the proof-of-work and
every Merkle decommitment, recomputes the DEEP composition at each query,
and walks the FRI layers down to the remainder polynomial.
"""

from ..air.expr import IntContext, evaluate_int, trace_arguments
from .fri import fri_fold_host, bitrev_int
from .scheme import get_scheme


class VerificationError(Exception):
    pass


def _check(cond, msg):
    if not cond:
        raise VerificationError(msg)


def verify(F, air_config, public_input, proof,
           required_security_bits: int = 80, scheme=None) -> bool:
    scheme = get_scheme(scheme)
    p = F.MODULUS
    options = proof.options
    _check(options.security_level_bits() >= required_security_bits,
           "proof options below required security level")
    n = proof.trace_len
    _check(n == public_input.n_steps * air_config.CYCLE_HEIGHT,
           "trace length inconsistent with public input")
    blowup = options.lde_blowup_factor
    N = n * blowup
    coset = F.GENERATOR
    g = F.root_of_unity_int(n)
    w_N = F.root_of_unity_int(N)
    m = air_config.CE_BLOWUP_FACTOR
    f = options.fri_folding_factor

    # -- replay transcript -------------------------------------------------
    coin = scheme.make_coin(public_input, options, n)
    coin.reseed_with_digest(proof.base_root)
    challenges = coin.draw_felts(p, air_config.NUM_CHALLENGES)
    coin.reseed_with_digest(proof.ext_root)
    alpha_comp = coin.draw_felt(p)
    coin.reseed_with_digest(proof.comp_root)
    z = coin.draw_felt(p)
    coin.reseed_with_field_elements(
        p, proof.oods_trace_values + proof.oods_comp_values)
    alpha_deep = coin.draw_felt(p)
    fri_betas = []
    for root in proof.fri_roots:
        coin.reseed_with_digest(root)
        fri_betas.append(coin.draw_felt(p))
    coin.reseed_with_field_elements(p, proof.fri_remainder)
    _check(len(proof.fri_remainder) <= options.fri_max_remainder_coeffs,
           "FRI remainder too large")
    _check(coin.verify_proof_of_work(proof.pow_nonce,
                                     options.proof_of_work_bits),
           "invalid proof of work")
    coin.reseed_with_int(proof.pow_nonce)
    indices = coin.draw_queries(options.num_queries, N)
    _check(len(indices) == len(proof.openings), "wrong number of openings")

    # -- OODS constraint identity -----------------------------------------
    constraints = air_config.constraints(n, p, g)
    targs = trace_arguments(constraints)
    _check(len(targs) == len(proof.oods_trace_values),
           "wrong number of OODS trace values")
    _check(m == len(proof.oods_comp_values),
           "wrong number of OODS composition values")
    hints = air_config.gen_hints(n, public_input, challenges, p)
    trace_values = dict(zip(targs, proof.oods_trace_values))
    periodic_cols = (air_config.periodic_columns(n)
                     if hasattr(air_config, "periodic_columns") else [])
    periodic_values = [pc.eval_int(z, p) for pc in periodic_cols]
    ctx = IntContext(p, z, trace_values, challenges, hints, periodic_values)
    cvals = evaluate_int(constraints, ctx)
    comp_at_z = cvals[-1]
    for cv in reversed(cvals[:-1]):
        comp_at_z = (comp_at_z * alpha_comp + cv) % p
    z_m = pow(z, m, p)
    claimed = 0
    for l in reversed(range(m)):
        claimed = (claimed * z + proof.oods_comp_values[l]) % p
    _check(comp_at_z == claimed, "OODS constraint identity failed")

    # -- per-query checks --------------------------------------------------
    offsets = sorted({off for (_, off) in targs})
    points = [z * pow(g, off % n, p) % p for off in offsets] + [z_m]
    # deep coefficient per trace arg / comp col (powers of alpha_deep)
    num_base = air_config.NUM_BASE_COLUMNS

    # FRI layer parameters
    layer_sizes = []
    Nl = N
    while Nl // blowup > options.fri_max_remainder_coeffs and Nl >= f:
        layer_sizes.append(Nl)
        Nl //= f
    _check(len(layer_sizes) == len(proof.fri_roots), "FRI layer count")

    for idx, opening in zip(indices, proof.openings):
        _check(len(opening.base_row) == num_base, "base row width")
        _check(len(opening.ext_row) == air_config.NUM_EXTENSION_COLUMNS,
               "ext row width")
        _check(len(opening.comp_row) == m, "composition row width")
        for vals, path, root, label in (
                (opening.base_row, opening.base_path, proof.base_root, "base"),
                (opening.ext_row, opening.ext_path, proof.ext_root, "ext"),
                (opening.comp_row, opening.comp_path, proof.comp_root, "comp")):
            _check(scheme.verify_row(F, root, idx, vals, path),
                   f"{label} Merkle path failed at query {idx}")

        # drawn indices are stored (bit-reversed) positions: the Merkle
        # leaf index is idx itself, the field point is at bitrev(idx)
        x = coset * pow(w_N, bitrev_int(idx, N.bit_length() - 1), p) % p

        def col_val(col):
            return (opening.base_row[col] if col < num_base
                    else opening.ext_row[col - num_base])

        deep_val = 0
        coeff = 1
        for j, (col, off) in enumerate(targs):
            k = offsets.index(off)
            t = proof.oods_trace_values[j]
            deep_val = (deep_val + coeff * (col_val(col) - t)
                        * pow(x - points[k], p - 2, p)) % p
            coeff = coeff * alpha_deep % p
        for l in range(m):
            deep_val = (deep_val
                        + coeff * (opening.comp_row[l]
                                   - proof.oods_comp_values[l])
                        * pow(x - z_m, p - 2, p)) % p
            coeff = coeff * alpha_deep % p

        # -- FRI walk (stored-index space: leaf = q // f, slot = q % f) ----
        _check(len(opening.fri_rows) == len(layer_sizes)
               and len(opening.fri_paths) == len(layer_sizes),
               f"wrong FRI opening count at query {idx}")
        logf = f.bit_length() - 1
        cur_val = deep_val
        cur_idx = idx
        layer_coset = coset
        for li, layer_size in enumerate(layer_sizes):
            half = layer_size // f
            b = cur_idx // f
            t_pos = cur_idx % f
            row = opening.fri_rows[li]
            _check(len(row) == f, "FRI row width")
            _check(scheme.verify_row(F, proof.fri_roots[li], b, row,
                                     opening.fri_paths[li]),
                   f"FRI layer {li} Merkle path failed")
            _check(row[t_pos] == cur_val,
                   f"FRI layer {li} value mismatch at query {idx}")
            # un-permute the row to natural within-coset order (stored slot
            # t holds the mu^bitrev(t) coset member) and fold at natural
            # coset index bitrev(b)
            row_nat = [row[bitrev_int(t, logf)] for t in range(f)]
            i_nat = bitrev_int(b, half.bit_length() - 1)
            w_l = F.root_of_unity_int(layer_size)
            cur_val = fri_fold_host(p, row_nat, i_nat, layer_size,
                                    layer_coset, w_l, f, fri_betas[li])
            cur_idx = b
            layer_coset = pow(layer_coset, f, p)

        # remainder check: R is over the offset-free domain (PARITY.md)
        last_size = layer_sizes[-1] // f if layer_sizes else N
        y = pow(F.root_of_unity_int(last_size),
                bitrev_int(cur_idx, last_size.bit_length() - 1), p)
        rem_val = 0
        for c in reversed(proof.fri_remainder):
            rem_val = (rem_val * y + c) % p
        _check(rem_val == cur_val, f"FRI remainder mismatch at query {idx}")

    return True
