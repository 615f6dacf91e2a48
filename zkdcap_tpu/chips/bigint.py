"""Non-native big-integer field chip — halo2-ecc `FpConfig`/CRT equivalent.

Reference semantics (SURVEY.md §2.2 D-ECC2/4): a foreign-field element is a
`CRTInteger` of NUM_LIMBS=3 limbs of LIMB_BITS=88 bits plus a native (mod r)
residue — the exact layout the reference pins (`crates/p256-ecdsa/src/
circuit.rs:26-27`, `lib.rs:80-81`), so public-instance encodings match.

Soundness of each modular operation uses the truncated-CRT argument
(halo2-ecc's check_carry_mod_to_zero): the identity

    a*b - q*p_t - out = 0      (over the integers)

is enforced (1) mod 2^264 by a limb-column carry chain with range-checked
signed carries, and (2) mod r by one native-residue gate; magnitude bounds
(q < 2^256 range-checked, a/b/out canonical < p_t) keep the value inside
(-2^264 * r / 2, 2^264 * r / 2), so CRT lifts both residues to integer zero.

Every operation returns a canonical (< p_t) CRT integer; this trades some
cells for the simpler invariant (halo2-ecc instead tracks lazy overflow).
"""

from __future__ import annotations

import dataclasses

from ..fields import BN254_FR
from .context import Context, FlexGate
from .range import RangeChip

R = BN254_FR.p
LIMB_BITS = 88
NUM_LIMBS = 3
LIMB_BASE = 1 << LIMB_BITS
LIMB_MASK = LIMB_BASE - 1
CARRY_SHIFT = 1 << 94  # signed carry |v| < 2^94 -> shifted into [0, 2^95)
CARRY_BITS = 95


def _split(v: int) -> list[int]:
    return [(v >> (LIMB_BITS * i)) & LIMB_MASK for i in range(NUM_LIMBS)]


@dataclasses.dataclass
class CRTInt:
    limbs: list[int]  # cell handles
    native: int  # cell handle
    value: int  # tracked integer value (canonical, < p_target)


class BigIntChip:
    def __init__(self, range_chip: RangeChip, p_target: int):
        self.rc = range_chip
        self.gate = range_chip.gate
        self.ctx = range_chip.ctx
        self.p = p_target
        assert p_target < 1 << 256
        self.p_limbs = _split(p_target)
        self.top_bits = max(p_target.bit_length() - 2 * LIMB_BITS, 1)

    # --- loading ----------------------------------------------------------

    def _native_of(self, limb_cells: list[int]) -> int:
        return self.gate.inner_product_const(
            limb_cells, [pow(2, LIMB_BITS * i, R) for i in range(NUM_LIMBS)]
        )

    def load_private(self, value: int, check_canonical: bool = True) -> CRTInt:
        value %= self.p
        limbs_v = _split(value)
        cells = [self.ctx.push(v) for v in limbs_v]
        self.rc.range_check(cells[0], LIMB_BITS)
        self.rc.range_check(cells[1], LIMB_BITS)
        self.rc.range_check(cells[2], self.top_bits)
        native = self._native_of(cells)
        out = CRTInt(cells, native, value)
        if check_canonical:
            self._check_lt_p(out)
        return out

    def load_constant(self, value: int) -> CRTInt:
        value %= self.p
        limbs_v = _split(value)
        cells = [self.ctx.constant(v) for v in limbs_v]
        native = self.ctx.constant(value % R)
        return CRTInt(cells, native, value)

    def from_limbs(self, limb_cells: list[int], value: int, check_canonical: bool = True) -> CRTInt:
        """Wrap existing range-checked-by-caller limb cells (88/88/top)."""
        native = self._native_of(limb_cells)
        out = CRTInt(limb_cells, native, value)
        if check_canonical:
            self._check_lt_p(out)
        return out

    def _check_lt_p(self, a: CRTInt) -> None:
        """Constrain a.value < p via witness d: a + d = p - 1 (carry chain)."""
        d_val = self.p - 1 - a.value
        assert d_val >= 0
        d = self.load_private_unchecked_range_only(d_val)
        pm1 = _split(self.p - 1)
        # limbwise: a_k + d_k + c_{k-1} = pm1_k + c_k * 2^88, c in {0,1}
        g = self.gate
        carry_prev = None
        total_a = a.limbs
        for k in range(NUM_LIMBS):
            lhs = g.add(total_a[k], d.limbs[k])
            if carry_prev is not None:
                lhs = g.add(lhs, carry_prev)
            lv = self.ctx.value(lhs)
            c = (lv - pm1[k]) % R
            carry_bit = 1 if (lv - pm1[k]) % R == LIMB_BASE else 0
            assert (lv - pm1[k]) % R in (0, LIMB_BASE), "lt_p carry broke"
            cb = self.ctx.push(carry_bit)
            g.assert_bit(cb)
            rhs = g.mul_add(cb, self.ctx.constant(LIMB_BASE), self.ctx.constant(pm1[k]))
            g.assert_equal(lhs, rhs)
            carry_prev = cb
        g.assert_const(carry_prev, 0)

    def load_private_unchecked_range_only(self, value: int) -> CRTInt:
        limbs_v = _split(value)
        cells = [self.ctx.push(v) for v in limbs_v]
        self.rc.range_check(cells[0], LIMB_BITS)
        self.rc.range_check(cells[1], LIMB_BITS)
        self.rc.range_check(cells[2], self.top_bits)
        native = self._native_of(cells)
        return CRTInt(cells, native, value)

    # --- carry-chain core -------------------------------------------------

    def _carry_chain(self, t_cells: list[int], t_ints: list[int]) -> None:
        """Constrain sum_k t_k 2^(88k) == 0 mod 2^264 with bounded carries."""
        g = self.gate
        v_prev_cell = None
        v_prev_int = 0
        for k in range(NUM_LIMBS):
            tot_int = t_ints[k] + v_prev_int
            assert tot_int % LIMB_BASE == 0, "carry chain misaligned"
            v_int = tot_int // LIMB_BASE
            if k < NUM_LIMBS - 1:
                v_cell = self.ctx.push(v_int % R)
                shifted = g.add_const(v_cell, CARRY_SHIFT)
                assert 0 <= v_int + CARRY_SHIFT < (1 << CARRY_BITS)
                self.rc.range_check(shifted, CARRY_BITS)
                lhs = t_cells[k] if v_prev_cell is None else g.add(t_cells[k], v_prev_cell)
                rhs = g.mul_const(v_cell, LIMB_BASE)
                g.assert_equal(lhs, rhs)
                v_prev_cell = v_cell
                v_prev_int = v_int
            else:
                # top limb: residue mod 2^264 complete; v_2 free but bounded
                v_cell = self.ctx.push(v_int % R)
                shifted = g.add_const(v_cell, CARRY_SHIFT)
                assert 0 <= v_int + CARRY_SHIFT < (1 << CARRY_BITS)
                self.rc.range_check(shifted, CARRY_BITS)
                lhs = t_cells[k] if v_prev_cell is None else g.add(t_cells[k], v_prev_cell)
                rhs = g.mul_const(v_cell, LIMB_BASE)
                g.assert_equal(lhs, rhs)

    # --- modular ops ------------------------------------------------------

    def mul(self, a: CRTInt, b: CRTInt) -> CRTInt:
        g = self.gate
        prod = a.value * b.value
        q_val, r_val = divmod(prod, self.p)
        assert q_val < 1 << 256
        q = self.load_private_unchecked_range_only(q_val)
        out = self.load_private(r_val)

        # t_k = sum_{i+j=k} a_i b_j - q_i p_j  - out_k   for k < 3
        a_int = _split(a.value)
        b_int = _split(b.value)
        q_int = _split(q_val)
        o_int = _split(r_val)
        t_cells = []
        t_ints = []
        for k in range(NUM_LIMBS):
            terms = None
            t_int = 0
            for i in range(k + 1):
                j = k - i
                if i < NUM_LIMBS and j < NUM_LIMBS:
                    m = g.mul(a.limbs[i], b.limbs[j])
                    terms = m if terms is None else g.add(terms, m)
                    t_int += a_int[i] * b_int[j]
                    qp = g.mul_const(q.limbs[i], self.p_limbs[j])
                    terms = g.sub(terms, qp)
                    t_int -= q_int[i] * self.p_limbs[j]
            terms = g.sub(terms, out.limbs[k])
            t_int -= o_int[k]
            t_cells.append(terms)
            t_ints.append(t_int)
        self._carry_chain(t_cells, t_ints)

        # native residue check
        ab = g.mul(a.native, b.native)
        qp = g.mul_const(q.native, self.p % R)
        lhs = g.sub(ab, qp)
        g.assert_equal(lhs, out.native)
        return out

    def _linear_mod(self, plus: list[CRTInt], minus: list[CRTInt], extra_p: int) -> CRTInt:
        """out = (sum plus - sum minus + extra_p * p) mod p with small q."""
        g = self.gate
        total = sum(x.value for x in plus) - sum(x.value for x in minus) + extra_p * self.p
        q_val, r_val = divmod(total, self.p)
        assert 0 <= q_val <= len(plus) + extra_p
        q_cell = self.ctx.push(q_val)
        # q is tiny: constrain q < 2^4 by bit decomposition
        self.rc.range_check(q_cell, 4)
        out = self.load_private(r_val)

        t_cells = []
        t_ints = []
        for k in range(NUM_LIMBS):
            terms = None
            t_int = 0
            for x in plus:
                terms = x.limbs[k] if terms is None else g.add(terms, x.limbs[k])
                t_int += _split(x.value)[k]
            for x in minus:
                if terms is None:
                    terms = g.neg(x.limbs[k])
                else:
                    terms = g.sub(terms, x.limbs[k])
                t_int -= _split(x.value)[k]
            cp = (extra_p * self.p_limbs[k] - 0) % R
            if extra_p:
                terms = g.add_const(terms, extra_p * self.p_limbs[k])
                t_int += extra_p * self.p_limbs[k]
            qp = g.mul_const(q_cell, self.p_limbs[k])
            terms = g.sub(terms, qp) if terms is not None else g.neg(qp)
            t_int -= q_val * self.p_limbs[k]
            terms = g.sub(terms, out.limbs[k])
            t_int -= _split(r_val)[k]
            t_cells.append(terms)
            t_ints.append(t_int)
        self._carry_chain(t_cells, t_ints)

        # native
        nat = None
        for x in plus:
            nat = x.native if nat is None else g.add(nat, x.native)
        for x in minus:
            nat = g.neg(x.native) if nat is None else g.sub(nat, x.native)
        if extra_p:
            nat = g.add_const(nat, extra_p * self.p % R)
        nat = g.sub(nat, g.mul_const(q_cell, self.p % R))
        g.assert_equal(nat, out.native)
        return out

    def add(self, a: CRTInt, b: CRTInt) -> CRTInt:
        return self._linear_mod([a, b], [], 0)

    def sub(self, a: CRTInt, b: CRTInt) -> CRTInt:
        return self._linear_mod([a], [b], 1)

    def neg(self, a: CRTInt) -> CRTInt:
        return self._linear_mod([], [a], 1)

    def inv(self, a: CRTInt) -> CRTInt:
        assert a.value != 0, "inverse of zero"
        inv_val = pow(a.value, -1, self.p)
        inv = self.load_private(inv_val)
        one = self.mul(a, inv)
        self.assert_equal_const(one, 1)
        return inv

    def div(self, a: CRTInt, b: CRTInt) -> CRTInt:
        return self.mul(a, self.inv(b))

    # --- comparisons / selection -----------------------------------------

    def assert_equal(self, a: CRTInt, b: CRTInt) -> None:
        for x, y_ in zip(a.limbs, b.limbs):
            self.gate.assert_equal(x, y_)

    def assert_equal_const(self, a: CRTInt, v: int) -> None:
        for x, lv in zip(a.limbs, _split(v % self.p)):
            self.gate.assert_const(x, lv)

    def is_zero(self, a: CRTInt) -> int:
        g = self.gate
        z = [g.is_zero(l) for l in a.limbs]
        return g.and_(g.and_(z[0], z[1]), z[2])

    def is_equal(self, a: CRTInt, b: CRTInt) -> int:
        g = self.gate
        z = [g.is_equal(x, y_) for x, y_ in zip(a.limbs, b.limbs)]
        return g.and_(g.and_(z[0], z[1]), z[2])

    def select(self, a: CRTInt, b: CRTInt, sel: int) -> CRTInt:
        """sel ? a : b."""
        g = self.gate
        limbs = [g.select(x, y_, sel) for x, y_ in zip(a.limbs, b.limbs)]
        native = g.select(a.native, b.native, sel)
        val = a.value if self.ctx.value(sel) else b.value
        return CRTInt(limbs, native, val)
