"""Batched BN254 G1 arithmetic on TPU (complete projective formulas).

TPU-native replacement for halo2curves' G1 group law as used by the
commitment MSMs (SURVEY.md §2.2 D-CURVE, §2.3 "Sharded Pippenger MSM").

Formulas: Renes–Costello–Batina 2015 complete addition/doubling for short
Weierstrass curves with a = 0 (Algorithms 7 and 9). Completeness is the
point: the same branch-free instruction sequence is correct for P+Q, P+P,
P+(-P), and the identity (0:1:0), which makes EC addition *associative as
an array op* — the property the MSM's masked/segmented reductions rely on
(SURVEY.md §7.4 item 2: "irregular point-add control flow must be
branchless").

A point is a pytree tuple (X, Y, Z) of packed Montgomery field elements,
homogeneous projective coordinates (x = X/Z, y = Y/Z), batched over leading
axes. Identity is (0 : 1 : 0).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import BN254_FQ, FieldParams, mont
from ..fields.params import NUM_LIMBS, int_to_limbs
from .host_curve import BN254_G1, CurveParams

Point = tuple[jax.Array, jax.Array, jax.Array]


@dataclasses.dataclass(frozen=True)
class CurveSpec:
    field: FieldParams
    b3: int  # 3*b of the curve equation y^2 = x^3 + b
    host: CurveParams

    @functools.cached_property
    def b3_mont(self) -> np.ndarray:
        from ..fields.params import R

        return int_to_limbs(self.b3 * R % self.field.p).astype(np.uint32)


G1_SPEC = CurveSpec(field=BN254_FQ, b3=9, host=BN254_G1)


def ec_inf(spec: CurveSpec, shape=()) -> Point:
    return (
        mont.zero(shape),
        mont.one_mont(spec.field, shape),
        mont.zero(shape),
    )


def ec_neg(spec: CurveSpec, P: Point) -> Point:
    X, Y, Z = P
    return (X, mont.neg(spec.field, Y), Z)


def ec_select(cond: jax.Array, P: Point, Q: Point) -> Point:
    """cond ? P : Q elementwise over the batch."""
    return tuple(jnp.where(cond[..., None], a, b) for a, b in zip(P, Q))


def ec_add(spec: CurveSpec, P: Point, Q: Point) -> Point:
    """Complete addition, RCB'15 Algorithm 7 (a = 0). 12M + 2*mul_b3."""
    f = spec.field
    mul = lambda a, b: mont.mont_mul(f, a, b)
    add = lambda a, b: mont.add(f, a, b)
    sub = lambda a, b: mont.sub(f, a, b)
    X1, Y1, Z1 = P
    X2, Y2, Z2 = Q
    b3 = jnp.broadcast_to(jnp.asarray(spec.b3_mont), X1.shape)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = mul(add(X1, Y1), add(X2, Y2))
    t3 = sub(t3, add(t0, t1))  # X1Y2 + X2Y1
    t4 = mul(add(Y1, Z1), add(Y2, Z2))
    t4 = sub(t4, add(t1, t2))  # Y1Z2 + Y2Z1
    t5 = mul(add(X1, Z1), add(X2, Z2))
    t5 = sub(t5, add(t0, t2))  # X1Z2 + X2Z1
    t0 = add(add(t0, t0), t0)  # 3 X1X2
    t2 = mul(b3, t2)  # b3 Z1Z2
    Z3 = add(t1, t2)  # Y1Y2 + b3 Z1Z2
    t1 = sub(t1, t2)  # Y1Y2 - b3 Z1Z2
    Y3 = mul(b3, t5)  # b3 (X1Z2 + X2Z1)
    X3 = sub(mul(t3, t1), mul(t4, Y3))
    Y3 = add(mul(t1, Z3), mul(Y3, t0))
    Z3 = add(mul(Z3, t4), mul(t0, t3))
    return (X3, Y3, Z3)


def ec_double(spec: CurveSpec, P: Point) -> Point:
    """Complete doubling, RCB'15 Algorithm 9 (a = 0). 6M + 2S + 1*mul_b3."""
    f = spec.field
    mul = lambda a, b: mont.mont_mul(f, a, b)
    add = lambda a, b: mont.add(f, a, b)
    sub = lambda a, b: mont.sub(f, a, b)
    X, Y, Z = P
    b3 = jnp.broadcast_to(jnp.asarray(spec.b3_mont), X.shape)

    t0 = mul(Y, Y)
    Z3 = add(t0, t0)
    Z3 = add(Z3, Z3)
    Z3 = add(Z3, Z3)  # 8 Y^2
    t1 = mul(Y, Z)
    t2 = mul(Z, Z)
    t2 = mul(b3, t2)  # b3 Z^2
    X3 = mul(t2, Z3)
    Y3 = add(t0, t2)
    Z3 = mul(t1, Z3)
    t1 = add(t2, t2)
    t2 = add(t1, t2)
    t0 = sub(t0, t2)
    Y3 = mul(t0, Y3)
    Y3 = add(X3, Y3)
    t1 = mul(X, Y)
    X3 = mul(t0, t1)
    X3 = add(X3, X3)
    return (X3, Y3, Z3)


def ec_is_inf(P: Point) -> jax.Array:
    return mont.is_zero(P[2])


# --- host <-> device -------------------------------------------------------

def encode_points(spec: CurveSpec, pts) -> jax.Array:
    """Host affine points [(x, y) | None, ...] -> uint32[N, 2, L] Montgomery.

    Infinity encodes as (0, 0); consumers must pair this with a digit/valid
    mask (affine (0,0) is not on the curve, so it is unambiguous).
    """
    xs, ys = [], []
    for pt in pts:
        if pt is None:
            xs.append(0)
            ys.append(0)
        else:
            xs.append(pt[0])
            ys.append(pt[1])
    x = mont.encode_ints(spec.field, xs)
    y = mont.encode_ints(spec.field, ys)
    return jnp.stack([x, y], axis=-2)


def affine_to_projective(spec: CurveSpec, pts: jax.Array) -> Point:
    """uint32[..., 2, L] Montgomery affine -> projective Point (Z=1, or inf for (0,0))."""
    X = pts[..., 0, :]
    Y = pts[..., 1, :]
    is_inf = jnp.logical_and(mont.is_zero(X), mont.is_zero(Y))
    one = mont.one_mont(spec.field, X.shape[:-1])
    Z = jnp.where(is_inf[..., None], jnp.zeros_like(X), one)
    Y = jnp.where(is_inf[..., None], one, Y)
    return (X, Y, Z)


def decode_points(spec: CurveSpec, P: Point):
    """Device projective points -> host affine list [(x, y) | None, ...]."""
    X, Y, Z = P
    p = spec.field.p
    xs = mont.decode_ints(spec.field, X)
    ys = mont.decode_ints(spec.field, Y)
    zs = mont.decode_ints(spec.field, Z)
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(None)
        else:
            zi = pow(z, -1, p)
            out.append((x * zi % p, y * zi % p))
    return out
