"""Cross-verification of reference (ark-serialized miniSTARK) proofs.

This is the differential-compatibility surface: `verify_ark` replays the
reference prover's Fiat-Shamir transcript over a proof parsed from the
ark-CanonicalSerialize byte layout (stark/ark.py) and checks every
commitment, the OODS constraint identity, the DEEP composition, and the
full FRI walk — using this repo's own coins, hash functions, AIR
constraint systems, and field arithmetic.

A reference proof accepting here demonstrates end-to-end semantic parity
with miniSTARK's Stark::verify as instantiated by sandstorm's
EthVerifierClaim (/root/reference/src/claims.rs:12-21, verify path
cli/src/main.rs:215-246): same transcript event order, same hash/coin
conventions, same constraint composition (powers of one alpha,
layouts/src/recursive/air.rs:1184-1200), same DEEP coefficients (powers
of one draw over trace args then composition columns, src/lib.rs:102-116
with degree coeffs (1, 0)), and same FRI folding.

Checked in tests/test_interop.py against the reference's checked-in
proofs (bootloader-proof.bin and example/array-sum.proof.saved).
"""

from ..air.expr import IntContext, evaluate_int, trace_arguments
from .ark import ArkProof, MerkleView
from .fri import fri_fold_host
from .options import ProofOptions
from .verifier import VerificationError, _check


def _leaf_hash(scheme_hash, row):
    """Row of felts -> 32-byte digest under the scheme's element hash."""
    return scheme_hash.hash_elements(row)


def _verify_merkle_view(H, root: bytes, num_leaves: int, index: int,
                        view: MerkleView, row, label: str):
    """Check one MerkleView (ministark merkle::MerkleView) against a root.

    The view carries the leaf at `index`, the leaf at `index ^ 1`, and the
    sibling digests for every level above the leaf pair, leaf-to-root.
    """
    if view.hashed:
        leaf = _leaf_hash(H, row)
        _check(view.initial_leaf == leaf,
               f"{label}: initial leaf does not match row hash")
        cur = leaf
        sib = view.sibling_leaf
    else:
        _check(len(row) == 1 and view.initial_leaf == row[0],
               f"{label}: initial (unhashed) leaf does not match value")
        cur = int(view.initial_leaf).to_bytes(32, "big")
        sib = int(view.sibling_leaf).to_bytes(32, "big")
    height = num_leaves.bit_length() - 1
    _check(len(view.nodes) == max(height - 1, 0),
           f"{label}: path length {len(view.nodes)} != {height - 1}")
    i = index
    cur = H.merge(cur, sib) if i % 2 == 0 else H.merge(sib, cur)
    i //= 2
    for node in view.nodes:
        cur = H.merge(cur, node) if i % 2 == 0 else H.merge(node, cur)
        i //= 2
    _check(cur == root, f"{label}: root mismatch")


def verify_ark(F, air_config, public_input, proof: ArkProof, scheme,
               required_security_bits: int = 0, trace=lambda m: None) -> bool:
    """Verify an ark-serialized reference proof. Raises VerificationError."""
    p = F.MODULUS
    q, blowup, pow_bits, f, max_rem = proof.options
    options = ProofOptions(
        num_queries=q, lde_blowup_factor=blowup, proof_of_work_bits=pow_bits,
        fri_folding_factor=f, fri_max_remainder_coeffs=max_rem)
    if required_security_bits:
        _check(options.security_level_bits() >= required_security_bits,
               "proof options below required security level")
    n = proof.trace_len
    _check(n == public_input.n_steps * air_config.CYCLE_HEIGHT,
           "trace length inconsistent with public input")
    N = n * blowup
    coset = F.GENERATOR
    g = F.root_of_unity_int(n)
    w_N = F.root_of_unity_int(N)
    m = air_config.CE_BLOWUP_FACTOR
    H = scheme.H  # element hash (row hashing + node merging)

    # -- transcript replay --------------------------------------------------
    coin = scheme.make_coin(public_input, options, n)
    coin.reseed_with_digest(proof.base_commitment)
    challenges = coin.draw_felts(p, air_config.NUM_CHALLENGES)
    if proof.ext_commitment is not None:
        coin.reseed_with_digest(proof.ext_commitment)
    alpha_comp = coin.draw_felt(p)
    coin.reseed_with_digest(proof.comp_commitment)
    z = coin.draw_felt(p)
    trace(f"z = {z}")
    coin.reseed_with_field_elements(
        p, list(proof.execution_ood_evals) + list(proof.composition_ood_evals))
    alpha_deep = coin.draw_felt(p)
    fri_betas = []
    for layer in proof.fri_layers:
        coin.reseed_with_digest(layer.commitment)
        fri_betas.append(coin.draw_felt(p))
    coin.reseed_with_field_elements(p, proof.fri_remainder)
    _check(len(proof.fri_remainder) <= max_rem, "FRI remainder too large")
    _check(coin.verify_proof_of_work(proof.pow_nonce, pow_bits),
           "invalid proof of work")
    trace("proof of work OK (transcript replay matches)")
    coin.reseed_with_int(proof.pow_nonce)
    indices = coin.draw_queries(q, N)
    trace(f"queries: {indices[:8]}... ({len(indices)})")

    # -- OODS constraint identity -------------------------------------------
    constraints = air_config.constraints(n, p, g)
    targs = trace_arguments(constraints)
    _check(len(targs) == len(proof.execution_ood_evals),
           "wrong number of OODS trace values")
    _check(m == len(proof.composition_ood_evals),
           "wrong number of OODS composition values")
    hints = air_config.gen_hints(n, public_input, challenges, p)
    trace_values = dict(zip(targs, proof.execution_ood_evals))
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
        claimed = (claimed * z + proof.composition_ood_evals[l]) % p
    _check(comp_at_z == claimed, "OODS constraint identity failed")
    trace("OODS constraint identity OK")

    # -- per-query data (rows stored row-major over sorted unique indices) --
    num_base = air_config.NUM_BASE_COLUMNS
    num_ext = air_config.NUM_EXTENSION_COLUMNS
    Q = len(indices)
    qs = proof.queries
    _check(len(qs.base_values) == Q * num_base, "base values length")
    _check(len(qs.ext_values) == Q * num_ext, "ext values length")
    _check(len(qs.comp_values) == Q * m, "composition values length")
    _check(len(qs.base_proofs) == Q and len(qs.comp_proofs) == Q,
           "trace proof count")

    def rows_of(vals, width):
        return [vals[i * width:(i + 1) * width] for i in range(Q)]

    base_rows = rows_of(qs.base_values, num_base)
    ext_rows = rows_of(qs.ext_values, num_ext)
    comp_rows = rows_of(qs.comp_values, m)

    for pos, idx in enumerate(indices):
        for rows, proofs, root, label in (
                (base_rows, qs.base_proofs, proof.base_commitment, "base"),
                (ext_rows, qs.ext_proofs, proof.ext_commitment, "ext"),
                (comp_rows, qs.comp_proofs, proof.comp_commitment, "comp")):
            _verify_merkle_view(H, root, N, idx, proofs[pos], rows[pos],
                                f"{label} tree, query {idx}")
    trace("trace Merkle decommitments OK")

    # -- DEEP + FRI walk per query ------------------------------------------
    offsets = sorted({off for (_, off) in targs})
    points = [z * pow(g, off % n, p) % p for off in offsets] + [z_m]

    # FRI layer sizes
    layer_sizes = []
    Nl = N
    while Nl // blowup > max_rem and Nl >= f:
        layer_sizes.append(Nl)
        Nl //= f
    _check(len(layer_sizes) == len(proof.fri_layers), "FRI layer count")

    # per-layer deduped index sets (ministark collapses queries as they
    # fold; values/proofs are stored per unique folded index, sorted)
    layer_indices = []
    cur = list(indices)
    for size in layer_sizes:
        half = size // f
        folded = sorted({i % half for i in cur})
        layer_indices.append(folded)
        cur = folded
    for li, (layer, idxs) in enumerate(zip(proof.fri_layers, layer_indices)):
        _check(len(layer.values) == len(idxs) * f,
               f"FRI layer {li} values length")
        _check(len(layer.proofs) == len(idxs),
               f"FRI layer {li} proof count")

    for pos, idx in enumerate(indices):
        x = coset * pow(w_N, idx, p) % p

        def col_val(col):
            return (base_rows[pos][col] if col < num_base
                    else ext_rows[pos][col - num_base])

        deep_val = 0
        coeff = 1
        for j, (col, off) in enumerate(targs):
            k = offsets.index(off)
            t = proof.execution_ood_evals[j]
            deep_val = (deep_val + coeff * (col_val(col) - t)
                        * pow(x - points[k], p - 2, p)) % p
            coeff = coeff * alpha_deep % p
        for l in range(m):
            deep_val = (deep_val
                        + coeff * (comp_rows[pos][l]
                                   - proof.composition_ood_evals[l])
                        * pow(x - z_m, p - 2, p)) % p
            coeff = coeff * alpha_deep % p

        cur_val = deep_val
        cur_idx = idx
        layer_coset = coset
        for li, layer_size in enumerate(layer_sizes):
            half = layer_size // f
            i = cur_idx % half
            t_pos = cur_idx // half
            lpos = layer_indices[li].index(i)
            row = proof.fri_layers[li].values[lpos * f:(lpos + 1) * f]
            _check(row[t_pos] == cur_val,
                   f"FRI layer {li} value mismatch at query {idx}")
            _verify_merkle_view(
                H, proof.fri_layers[li].commitment, half, i,
                proof.fri_layers[li].proofs[lpos], row,
                f"FRI layer {li}, query {idx}")
            w_l = F.root_of_unity_int(layer_size)
            cur_val = fri_fold_host(p, row, i, layer_size, layer_coset,
                                    w_l, f, fri_betas[li])
            cur_idx = i
            layer_coset = pow(layer_coset, f, p)

        last_size = layer_sizes[-1] // f if layer_sizes else N
        y = layer_coset * pow(F.root_of_unity_int(last_size), cur_idx, p) % p
        rem_val = 0
        for c in reversed(proof.fri_remainder):
            rem_val = (rem_val * y + c) % p
        _check(rem_val == cur_val, f"FRI remainder mismatch at query {idx}")
    trace("DEEP + FRI walk OK")

    return True
