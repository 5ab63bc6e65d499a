"""Builtin witness-generator tests: known-answer vectors from public
StarkWare sources (starkex-resources signature_test_data.json,
starkware-industries/poseidon) + structural/self-consistency checks —
mirroring the reference's test strategy (SURVEY.md §4).
"""

import random

import pytest

from sandstorm_tpu.builtins import (
    curve, pedersen, poseidon, range_check, bitwise, ecdsa, ec_op)


class TestCurve:
    def test_generator_on_curve_and_order(self):
        assert curve.is_on_curve(curve.GENERATOR)
        assert curve.ec_mul(curve.FR, curve.GENERATOR) is None

    def test_add_double_consistency(self):
        g = curve.GENERATOR
        assert curve.ec_mul(5, g) == curve.ec_add(
            curve.ec_double(curve.ec_double(g)), g)

    def test_recover_y(self):
        x, y = curve.GENERATOR
        got = curve.recover_y(x)
        assert got in (y, (-y) % curve.P)


class TestPedersen:
    def test_starkex_vector_0(self):
        # starkex-resources signature_test_data.json
        a = 1740729136829561885683894917751815192814966525555656371386868611731128807883
        b = 919869093895560023824014392670608914007817594969197822578496829435657368346
        expected = 1382171651951541052082654537810074813456022260470662576358627909045455537762
        assert pedersen.pedersen_hash(a, b) == expected

    def test_starkex_vector_1(self):
        a = 2514830971251288745316508723959465399194546626755475650431255835704887319877
        b = 3405079826265633459083097571806844574925613129801245865843963067353416465931
        expected = 2962565761002374879415469392216379291665599807391815720833106117558254791559
        assert pedersen.pedersen_hash(a, b) == expected

    def test_native_witness_batch_matches_python(self):
        """Differential: native pedersen_witness_batch == python oracle
        on a starkex vector (every partial point, suffix, slope, flags)."""
        import dataclasses

        from sandstorm_tpu import native
        if not native.ecdsa_available():
            import pytest
            pytest.skip("native toolchain unavailable")
        a = 1740729136829561885683894917751815192814966525555656371386868611731128807883
        b = 919869093895560023824014392670608914007817594969197822578496829435657368346
        py = pedersen.InstanceTrace.new(4, a, b)
        nat = pedersen._new_batch_native(
            pedersen.InstanceTrace, [(4, a, b)])[0]
        assert py == nat
        batch = pedersen.InstanceTrace.new_batch(
            [(i, a, b) for i in range(3)] + [(3, 0, 0)])
        for i, t in enumerate(batch[:3]):
            assert t == dataclasses.replace(py, index=i)
        assert batch[3] == pedersen.InstanceTrace.new(3, 0, 0)

    def test_instance_trace(self):
        rng = random.Random(3)
        a = rng.randrange(1 << 250)
        b = rng.randrange(1 << 250)
        t = pedersen.InstanceTrace.new(0, a, b)
        assert t.output == pedersen.pedersen_hash(a, b)
        assert len(t.a_steps) == 256 and len(t.b_steps) == 256
        # step suffixes follow x >> i
        assert t.a_steps[0].suffix == a
        assert t.a_steps[5].suffix == a >> 5
        # final partial sum x-coordinate is the hash
        assert t.b_steps[-1].point is not None

    def test_dummy(self):
        d = pedersen.dummy_instance_trace(7)
        assert d.index == 7
        assert d.output == pedersen.pedersen_hash(0, 0)


class TestPoseidon:
    def test_zero_permutation_matches_starkware(self):
        expected = [
            3446325744004048536138401612021367625846492093718951375866996507163446763827,
            1590252087433376791875644726012779423683501236913937337746052470473806035332,
            867921192302518434283879514999422690776342565400001269945778456016268852423,
        ]
        assert poseidon.permute([0, 0, 0]) == expected

    def test_instance_trace_rounds(self):
        t = poseidon.InstanceTrace.new(0, 1, 2, 3)
        # optimized-variant witness: 4+4 full-round state records and the
        # 83 partial-round S-box inputs; output matches the plain permutation
        assert len(t.full_round_states_1st_half) == 4
        assert len(t.full_round_states_2nd_half) == 4
        assert len(t.partial_round_states) == 83
        assert [t.output0, t.output1, t.output2] == poseidon.permute([1, 2, 3])


class TestRangeCheck:
    def test_parts_recompose(self):
        v = 0x0123456789ABCDEF_FEDCBA9876543210
        t = range_check.InstanceTrace.new(0, v)
        assert len(t.parts) == 8
        recomposed = 0
        for p in t.parts:
            recomposed = (recomposed << 16) | p
        assert recomposed == v


class TestBitwise:
    def test_dilute_roundtrip(self):
        rng = random.Random(4)
        for _ in range(10):
            x = rng.randrange(1 << 16)
            assert bitwise.undilute(bitwise.dilute(x)) == x

    def test_dilute_value(self):
        # bit i of x lands at bit 4*i (bitwise/mod.rs:135-146 dilute test)
        assert bitwise.dilute(0b1011) == 0b1000000010001

    def test_partition_sums_to_value(self):
        rng = random.Random(5)
        x = rng.randrange(1 << 251)
        segs = bitwise.partition(x)
        assert len(segs) == 16
        # sum_offset sum_quarter  undiluted quarters shifted reassemble x
        total = 0
        for offset in range(4):
            for q in range(4):
                seg = segs[offset * 4 + q]
                quarter = bitwise.undilute(seg)
                for k in range(16):
                    if (quarter >> k) & 1:
                        total |= 1 << (offset + 4 * (16 * q + k))
        assert total == x

    def test_instance(self):
        t = bitwise.InstanceTrace.new(0, 0b1100, 0b1010)
        assert t.x_and_y == 0b1000 and t.x_xor_y == 0b0110 and t.x_or_y == 0b1110


class TestEcdsa:
    def test_dummy_instance_valid(self):
        d = ecdsa.InstanceTrace.new_dummy(3)
        assert d.index == 3
        assert len(d.zg_steps) == 256
        assert len(d.rq_steps) == 256
        assert len(d.wb_steps) == 256
        assert curve.is_on_curve(d.pubkey)

    def test_verify_rejects_bad_signature(self):
        pubkey_x, message, r, w = ecdsa.gen_dummy_instance()
        assert ecdsa.verify(message, r, w, pubkey_x) is not None
        assert ecdsa.verify((message + 1) % curve.P, r, w, pubkey_x) is None

    def test_native_batch_matches_python(self):
        """Differential: the C++ batch witness generator (native/ecdsa.cpp)
        must reproduce the python oracle field-for-field — every partial
        sum, slope, x-diff inverse, doubling chain and scalar inverse."""
        import dataclasses

        from sandstorm_tpu import native
        if not native.ecdsa_available():
            import pytest
            pytest.skip("native toolchain unavailable")
        pubkey_x, message, r, w = ecdsa.gen_dummy_instance()
        py = ecdsa.InstanceTrace.new(7, pubkey_x, message, r, w)
        nat = ecdsa._new_batch_native(
            ecdsa.InstanceTrace, [(7, pubkey_x, message, r, w)])[0]
        assert py == nat
        # both pubkey-y parities must recover (the retry path): the mirrored
        # pubkey fails chain/r checks natively and flips back to y
        assert nat.pubkey == py.pubkey
        batch = ecdsa.InstanceTrace.new_batch(
            [(i, pubkey_x, message, r, w) for i in range(3)])
        for i, t in enumerate(batch):
            assert t == dataclasses.replace(py, index=i)


class TestEcOp:
    def test_dummy(self):
        d = ec_op.InstanceTrace.new_dummy(1)
        # r = p + 1 * q = shift + generator
        expected = curve.ec_add(pedersen.shift_and_table_points()[0],
                                curve.GENERATOR)
        assert d.r == expected

    def test_matches_scalar_mul(self):
        g = curve.GENERATOR
        p = curve.ec_mul(7, g)
        q = curve.ec_mul(11, g)
        m = 13
        t = ec_op.InstanceTrace.new(0, p[0], p[1], q[0], q[1], m)
        assert t.r == curve.ec_add(p, curve.ec_mul(m, q))

    def test_native_batch_matches_python(self):
        """Differential: native ec_op_witness_batch == python oracle."""
        import dataclasses

        from sandstorm_tpu import native
        if not native.ecdsa_available():
            import pytest
            pytest.skip("native toolchain unavailable")
        g = curve.GENERATOR
        p = curve.ec_mul(5, g)
        q = curve.ec_mul(9, g)
        m = (1 << 251) | (1 << 196) | (1 << 192) | 0xDEADBEEF
        py = ec_op.InstanceTrace.new(2, p[0], p[1], q[0], q[1], m)
        nat = ec_op._new_batch_native(
            ec_op.InstanceTrace, [(2, p[0], p[1], q[0], q[1], m)])[0]
        assert py == nat
        batch = ec_op.InstanceTrace.new_batch(
            [(i, p[0], p[1], q[0], q[1], m) for i in range(3)])
        for i, t in enumerate(batch):
            assert t == dataclasses.replace(py, index=i)
