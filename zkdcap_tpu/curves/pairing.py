"""BN254 optimal-ate pairing, host-side (python bigint).

Role: the verifier-scale pairing check of KZG/SHPLONK openings
(SURVEY.md §3.1 step "verify_proof ... pairing check; host-scale" and
§7.2 step 3: "G2/pairing: host-side, tiny"). The prover never pairs; a
verification is two Miller loops + one final exponentiation.

Tower: Fq2 = Fq[u]/(u^2+1), Fq6 = Fq2[v]/(v^3 - (9+u)), Fq12 = Fq6[w]/(w^2 - v).
G2 lives on the D-twist y^2 = x^3 + 3/(9+u); points are embedded into
E(Fq12) via (x, y) -> (x w^2, y w^3) for a straightforward Miller loop.
"""

from __future__ import annotations

P = 21888242871839275222246405745257275088696311157297823662689037894645226208583
R_ORDER = 21888242871839275222246405745257275088548364400416034343698204186575808495617
ATE_LOOP_COUNT = 29793968203157093288  # 6x+2 for x = 4965661367192848881


# --- Fq2 -------------------------------------------------------------------

class Fq2:
    __slots__ = ("c0", "c1")

    def __init__(self, c0: int, c1: int):
        self.c0 = c0 % P
        self.c1 = c1 % P

    def __add__(s, o):
        return Fq2(s.c0 + o.c0, s.c1 + o.c1)

    def __sub__(s, o):
        return Fq2(s.c0 - o.c0, s.c1 - o.c1)

    def __neg__(s):
        return Fq2(-s.c0, -s.c1)

    def __mul__(s, o):
        if isinstance(o, int):
            return Fq2(s.c0 * o, s.c1 * o)
        a = s.c0 * o.c0
        b = s.c1 * o.c1
        c = (s.c0 + s.c1) * (o.c0 + o.c1)
        return Fq2(a - b, c - a - b)

    __rmul__ = __mul__

    def __eq__(s, o):
        return s.c0 == o.c0 and s.c1 == o.c1

    def inv(s):
        d = pow(s.c0 * s.c0 + s.c1 * s.c1, -1, P)
        return Fq2(s.c0 * d, -s.c1 * d)

    def conj(s):
        return Fq2(s.c0, -s.c1)

    @staticmethod
    def zero():
        return Fq2(0, 0)

    @staticmethod
    def one():
        return Fq2(1, 0)

    def is_zero(s):
        return s.c0 == 0 and s.c1 == 0


XI = Fq2(9, 1)  # the sextic-twist constant


def _mul_by_xi(a: Fq2) -> Fq2:
    return a * XI


# --- Fq6 (coeffs c0 + c1 v + c2 v^2 over Fq2) ------------------------------

class Fq6:
    __slots__ = ("c0", "c1", "c2")

    def __init__(self, c0: Fq2, c1: Fq2, c2: Fq2):
        self.c0, self.c1, self.c2 = c0, c1, c2

    def __add__(s, o):
        return Fq6(s.c0 + o.c0, s.c1 + o.c1, s.c2 + o.c2)

    def __sub__(s, o):
        return Fq6(s.c0 - o.c0, s.c1 - o.c1, s.c2 - o.c2)

    def __neg__(s):
        return Fq6(-s.c0, -s.c1, -s.c2)

    def __mul__(s, o):
        a0, a1, a2 = s.c0, s.c1, s.c2
        b0, b1, b2 = o.c0, o.c1, o.c2
        t0 = a0 * b0
        t1 = a1 * b1
        t2 = a2 * b2
        c0 = t0 + _mul_by_xi((a1 + a2) * (b1 + b2) - t1 - t2)
        c1 = (a0 + a1) * (b0 + b1) - t0 - t1 + _mul_by_xi(t2)
        c2 = (a0 + a2) * (b0 + b2) - t0 - t2 + t1
        return Fq6(c0, c1, c2)

    def __eq__(s, o):
        return s.c0 == o.c0 and s.c1 == o.c1 and s.c2 == o.c2

    def mul_by_v(s):
        return Fq6(_mul_by_xi(s.c2), s.c0, s.c1)

    def inv(s):
        a0, a1, a2 = s.c0, s.c1, s.c2
        t0 = a0 * a0 - _mul_by_xi(a1 * a2)
        t1 = _mul_by_xi(a2 * a2) - a0 * a1
        t2 = a1 * a1 - a0 * a2
        d = a0 * t0 + _mul_by_xi(a1 * t2) + _mul_by_xi(a2 * t1)
        di = d.inv()
        return Fq6(t0 * di, t1 * di, t2 * di)

    @staticmethod
    def zero():
        return Fq6(Fq2.zero(), Fq2.zero(), Fq2.zero())

    @staticmethod
    def one():
        return Fq6(Fq2.one(), Fq2.zero(), Fq2.zero())

    def is_zero(s):
        return s.c0.is_zero() and s.c1.is_zero() and s.c2.is_zero()


# --- Fq12 (c0 + c1 w over Fq6) ---------------------------------------------

class Fq12:
    __slots__ = ("c0", "c1")

    def __init__(self, c0: Fq6, c1: Fq6):
        self.c0, self.c1 = c0, c1

    def __add__(s, o):
        return Fq12(s.c0 + o.c0, s.c1 + o.c1)

    def __sub__(s, o):
        return Fq12(s.c0 - o.c0, s.c1 - o.c1)

    def __neg__(s):
        return Fq12(-s.c0, -s.c1)

    def __mul__(s, o):
        a = s.c0 * o.c0
        b = s.c1 * o.c1
        c0 = a + b.mul_by_v()
        c1 = (s.c0 + s.c1) * (o.c0 + o.c1) - a - b
        return Fq12(c0, c1)

    def __eq__(s, o):
        return s.c0 == o.c0 and s.c1 == o.c1

    def inv(s):
        d = (s.c0 * s.c0 - (s.c1 * s.c1).mul_by_v()).inv()
        return Fq12(s.c0 * d, -(s.c1 * d))

    def pow(s, e: int):
        if e < 0:
            return s.inv().pow(-e)
        acc = Fq12.one()
        base = s
        while e:
            if e & 1:
                acc = acc * base
            base = base * base
            e >>= 1
        return acc

    @staticmethod
    def zero():
        return Fq12(Fq6.zero(), Fq6.zero())

    @staticmethod
    def one():
        return Fq12(Fq6.one(), Fq6.zero())

    def is_zero(s):
        return s.c0.is_zero() and s.c1.is_zero()

    @staticmethod
    def from_int(x: int):
        return Fq12(Fq6(Fq2(x, 0), Fq2.zero(), Fq2.zero()), Fq6.zero())

    def frobenius_p(s):
        """x -> x^p (generic, via pow; used only a few times per pairing)."""
        return s.pow(P)


# --- G2 (affine over Fq2, twist curve y^2 = x^3 + 3/xi) --------------------

B2 = Fq2(3, 0) * XI.inv()

G2_GEN = (
    Fq2(
        10857046999023057135944570762232829481370756359578518086990519993285655852781,
        11559732032986387107991004021392285783925812861821192530917403151452391805634,
    ),
    Fq2(
        8495653923123431417604973247489272438418190587263600148770280649306958101930,
        4082367875863433681332203403145435568316851327593401208105741076214120093531,
    ),
)

G2Point = tuple[Fq2, Fq2] | None


def g2_is_on_curve(pt: G2Point) -> bool:
    if pt is None:
        return True
    x, y = pt
    return y * y == x * x * x + B2


def g2_add(p1: G2Point, p2: G2Point) -> G2Point:
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2 and (y1 + y2).is_zero():
        return None
    if p1 == p2:
        lam = (x1 * x1 * 3) * (y1 * 2).inv()
    else:
        lam = (y2 - y1) * (x2 - x1).inv()
    x3 = lam * lam - x1 - x2
    y3 = lam * (x1 - x3) - y1
    return (x3, y3)


def g2_neg(pt: G2Point) -> G2Point:
    if pt is None:
        return None
    return (pt[0], -pt[1])


def g2_mul(k: int, pt: G2Point) -> G2Point:
    k %= R_ORDER
    acc = None
    add = pt
    while k:
        if k & 1:
            acc = g2_add(acc, add)
        add = g2_add(add, add)
        k >>= 1
    return acc


# --- Miller loop over embedded E(Fq12) -------------------------------------

EPoint = tuple[Fq12, Fq12] | None


def _embed_g1(pt) -> EPoint:
    if pt is None:
        return None
    return (Fq12.from_int(pt[0]), Fq12.from_int(pt[1]))


def _embed_g2(pt: G2Point) -> EPoint:
    """(x, y) on the twist -> (x w^2, y w^3) on E(Fq12)."""
    if pt is None:
        return None
    x, y = pt
    w2 = Fq12(Fq6(Fq2.zero(), Fq2.one(), Fq2.zero()), Fq6.zero())  # v = w^2
    w3 = Fq12(Fq6.zero(), Fq6(Fq2.zero(), Fq2.one(), Fq2.zero()))  # v w = w^3
    xe = Fq12(Fq6(Fq2.zero(), x, Fq2.zero()), Fq6.zero())  # x * v
    ye = Fq12(Fq6.zero(), Fq6(Fq2.zero(), y, Fq2.zero()))  # y * v w
    return (xe, ye)


def _e_add(p1: EPoint, p2: EPoint) -> EPoint:
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2 and (y1 + y2).is_zero():
        return None
    if p1 == p2:
        lam = (x1 * x1 * Fq12.from_int(3)) * (y1 + y1).inv()
    else:
        lam = (y2 - y1) * (x2 - x1).inv()
    x3 = lam * lam - x1 - x2
    y3 = lam * (x1 - x3) - y1
    return (x3, y3)


def _linefunc(p1: EPoint, p2: EPoint, t: EPoint) -> Fq12:
    x1, y1 = p1
    x2, y2 = p2
    xt, yt = t
    if not (x1 == x2):
        m = (y2 - y1) * (x2 - x1).inv()
        return m * (xt - x1) - (yt - y1)
    if y1 == y2:
        m = (x1 * x1 * Fq12.from_int(3)) * (y1 + y1).inv()
        return m * (xt - x1) - (yt - y1)
    return xt - x1


def miller_loop(q_g2: G2Point, p_g1) -> Fq12:
    """Miller loop of the optimal ate pairing (no final exponentiation)."""
    if q_g2 is None or p_g1 is None:
        return Fq12.one()
    Q = _embed_g2(q_g2)
    Pt = _embed_g1(p_g1)
    R = Q
    f = Fq12.one()
    for bit in bin(ATE_LOOP_COUNT)[3:]:
        f = f * f * _linefunc(R, R, Pt)
        R = _e_add(R, R)
        if bit == "1":
            f = f * _linefunc(R, Q, Pt)
            R = _e_add(R, Q)
    q1 = (Q[0].frobenius_p(), Q[1].frobenius_p())
    nq2 = (q1[0].frobenius_p(), -(q1[1].frobenius_p()))
    f = f * _linefunc(R, q1, Pt)
    R = _e_add(R, q1)
    f = f * _linefunc(R, nq2, Pt)
    return f


FINAL_EXP = (P**12 - 1) // R_ORDER


def final_exponentiation(f: Fq12) -> Fq12:
    """f^((p^12-1)/r), with the cheap "easy part" done via conjugation.

    f^(p^6) is the conjugate (c0, -c1) since w^(p^6) = -w for this tower,
    so f^(p^6 - 1) = conj(f) * f^-1, cutting the naive 3000-bit pow roughly
    in half; the remaining exponent is (p^6+1)(p^2+1)... done by plain pow.
    """
    easy = Fq12(f.c0, -f.c1) * f.inv()  # f^(p^6 - 1)
    # (p^12-1)/r = (p^6-1) * (p^2+1) * ((p^4-p^2+1)/r)
    rest = (P**2 + 1) * ((P**4 - P**2 + 1) // R_ORDER)
    return easy.pow(rest)


def pairing(q_g2: G2Point, p_g1) -> Fq12:
    return final_exponentiation(miller_loop(q_g2, p_g1))


def pairing_product_is_one(pairs) -> bool:
    """Check prod e(P_i, Q_i) == 1 with one shared final exponentiation.

    `pairs` is a list of (g1_point, g2_point) with g1 as (x, y) ints.
    This is the KZG/SHPLONK verification primitive.
    """
    f = Fq12.one()
    for g1, g2 in pairs:
        f = f * miller_loop(g2, g1)
    return final_exponentiation(f) == Fq12.one()
