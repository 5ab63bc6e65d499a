"""Native C++ batched Pedersen vs the pure-python reference implementation."""

import random

import pytest

native = pytest.importorskip("sandstorm_tpu.native")

if not native.available():  # no toolchain — skip the module
    pytest.skip("native extension unavailable", allow_module_level=True)


def test_pedersen_pairs_match_python():
    # compare against the pure-python oracle (pedersen_hash itself routes
    # through the native batch when available)
    from sandstorm_tpu.builtins.pedersen import pedersen_hash_oracle \
        as pedersen_hash
    from sandstorm_tpu.builtins.curve import P
    rng = random.Random(5)
    a = [0, 1, P - 1, (1 << 252) - 1 if (1 << 252) - 1 < P else P - 2] + \
        [rng.randrange(P) for _ in range(28)]
    b = [0, 0, 1, 2] + [rng.randrange(P) for _ in range(28)]
    got = native.pedersen_hash_pairs_ints(a, b)
    for ai, bi, gi in zip(a, b, got):
        assert gi == pedersen_hash(ai, bi), (ai, bi)


def test_starkex_vector():
    """Known-answer vector from starkex-resources (the same KAT the python
    implementation is pinned to, builtins/src/pedersen/mod.rs:178-212)."""
    a = 0x3d937c035c878245caf64531a5756109c53068da139362728feb561405371cb
    b = 0x208a0a10250e382e1e4bbe2880906c2791bf6275695e02fbbc6aeff9cd8b31a
    want = 0x30e480bed5fe53fa909cc0f8c4d99b8f9f2c016be4c41e13a4848797979c662
    assert native.pedersen_hash_pairs_ints([a], [b])[0] == want
