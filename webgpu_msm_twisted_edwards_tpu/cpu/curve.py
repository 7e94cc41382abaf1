"""Pure-Python extended twisted Edwards curve arithmetic (ground truth).

Analogue of the reference's noble-curves `FieldMath` point layer
(reference: src/reference/utils/FieldMath.ts:31-137) plus the CPU point-add
variants (reference: src/submission/miscellaneous/add_points.ts:4-112).

Curve: a*x^2 + y^2 = 1 + d*x^2*y^2 over F_p with a = -1, d = 3021
("Edwards BLS12" / ed-on-bls12-377).  Points are held in extended
coordinates (X, Y, T, Z) with x = X/Z, y = Y/Z, T = XY/Z.
"""

from __future__ import annotations

import dataclasses

from ..utils.params import EDWARDS_A, EDWARDS_D, GENERATOR_X, GENERATOR_Y, P, SUBGROUP_ORDER
from . import field as F


@dataclasses.dataclass(frozen=True)
class ExtPoint:
    x: int
    y: int
    t: int
    z: int

    @staticmethod
    def identity() -> "ExtPoint":
        return ExtPoint(0, 1, 0, 1)

    @staticmethod
    def from_affine(x: int, y: int) -> "ExtPoint":
        return ExtPoint(x % P, y % P, (x * y) % P, 1)

    def to_affine(self) -> tuple[int, int]:
        zinv = F.finv(self.z)
        return (self.x * zinv) % P, (self.y * zinv) % P

    def is_identity(self) -> bool:
        # x/z == 0 and y/z == 1
        return self.x % P == 0 and (self.y - self.z) % P == 0

    def neg(self) -> "ExtPoint":
        return ExtPoint((-self.x) % P, self.y, (-self.t) % P, self.z)

    def add(self, o: "ExtPoint") -> "ExtPoint":
        """add-2008-hwcd (9M + 2D); unified for a = -1 since -1 is a QR mod p
        and d is a non-residue (reference kernel analogue:
        src/submission/implementation/wgsl/curve/ec.template.wgsl:34-66)."""
        p = P
        a = self.x * o.x % p
        b = self.y * o.y % p
        c = EDWARDS_D * self.t % p * o.t % p
        d = self.z * o.z % p
        e = ((self.x + self.y) * (o.x + o.y) - a - b) % p
        f = (d - c) % p
        g = (d + c) % p
        h = (b + a) % p  # B - a*A with a = -1
        return ExtPoint(e * f % p, g * h % p, e * h % p, f * g % p)

    def double(self) -> "ExtPoint":
        """dbl-2008-hwcd (reference: ec.template.wgsl:7-30)."""
        p = P
        a = self.x * self.x % p
        b = self.y * self.y % p
        c = 2 * self.z * self.z % p
        d = (-a) % p  # a coefficient = -1
        e = ((self.x + self.y) * (self.x + self.y) - a - b) % p
        g = (d + b) % p
        f = (g - c) % p
        h = (d - b) % p
        return ExtPoint(e * f % p, g * h % p, e * h % p, f * g % p)

    def mul(self, k: int) -> "ExtPoint":
        """Double-and-add scalar multiplication (ground truth; reference
        analogue: src/submission/miscellaneous/scalar_mul_benchmarks.ts:169)."""
        k %= SUBGROUP_ORDER
        acc = ExtPoint.identity()
        base = self
        while k:
            if k & 1:
                acc = acc.add(base)
            base = base.double()
            k >>= 1
        return acc

    def assert_on_curve(self) -> None:
        x, y = self.to_affine()
        lhs = (EDWARDS_A * x * x + y * y) % P
        rhs = (1 + EDWARDS_D * x * x % P * y * y) % P
        assert lhs == rhs, "point not on curve"


GENERATOR = ExtPoint.from_affine(GENERATOR_X, GENERATOR_Y)


def get_point_from_x(x: int) -> ExtPoint:
    """Recover y from x with subgroup membership check
    (reference: FieldMath.ts:31-55 `getPointFromX`)."""
    # a*x^2 + y^2 = 1 + d*x^2*y^2  =>  y^2 = (1 - a*x^2) / (1 - d*x^2)
    num = (1 - EDWARDS_A * x * x) % P
    den = (1 - EDWARDS_D * x * x) % P
    y2 = num * F.finv(den) % P
    y = F.fsqrt(y2)
    if y is None:
        raise ValueError("x is not on the curve")
    pt = ExtPoint.from_affine(x, y)
    if not pt.mul(SUBGROUP_ORDER).is_identity():
        pt = ExtPoint.from_affine(x, (-y) % P)
        if not pt.mul(SUBGROUP_ORDER).is_identity():
            raise ValueError("neither y candidate is in the prime-order subgroup")
    return pt


def naive_msm(points: list[ExtPoint], scalars: list[int]) -> ExtPoint:
    """Ground-truth MSM: sum of per-point scalar muls (the oracle the
    reference tests against in miscellaneous/tests/cuzk.test.ts:27-141)."""
    acc = ExtPoint.identity()
    for pt, s in zip(points, scalars):
        acc = acc.add(pt.mul(s))
    return acc
