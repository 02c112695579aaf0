"""Host-side field constants and pure-Python (int) field/curve arithmetic.

This is the "slow oracle" layer: exact Python-int implementations of the
Pasta base/scalar fields and the Pallas curve, used for

  * host-side single-scalar arithmetic (Fiat-Shamir challenges, xi^-1, ...),
  * an independent reference oracle the vectorized TPU kernels are tested
    against,
  * (de)serialization helpers that need canonical integers.

Reference parity: the reference library uses the arkworks ark-pallas crate
(/root/reference/code/Cargo.toml); the primes, curve equation and generator
below match ark-pallas 0.5 (curve y^2 = x^3 + 5 over Fq, generator (-1, 2)).
"""

from __future__ import annotations

# --- Pasta primes -----------------------------------------------------------
# Base field of the Pallas curve (coordinates live here).
Q = 0x40000000000000000000000000000000224698FC094CF91B992D30ED00000001
# Scalar field of the Pallas curve (= base field of Vesta).
R = 0x40000000000000000000000000000000224698FC0994A8DD8C46EB2100000001

# Both primes have the sparse form p = 2^254 + C with C < 2^126, which the
# TPU kernels exploit for branchless reduction (see ops/field.py).
C_Q = Q - (1 << 254)
C_R = R - (1 << 254)
assert C_Q < (1 << 126) and C_R < (1 << 126)

# Curve: y^2 = x^3 + B over Fq, prime order R.
B_COEFF = 5
# ark-pallas generator: (-1, 2).  (-1)^3 + 5 = 4 = 2^2.
G_X = Q - 1
G_Y = 2



def inv_mod(a: int, p: int) -> int:
    return pow(a, -1, p)


def sqrt_mod(a: int, p: int) -> int | None:
    """Tonelli-Shanks square root mod p (p odd prime). Returns None if a is
    not a QR. Both Pasta primes have 2-adicity 32."""
    a %= p
    if a == 0:
        return 0
    if pow(a, (p - 1) // 2, p) != 1:
        return None
    # p - 1 = q * 2^s with q odd
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    # find a non-residue
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    m, c, t, r = s, pow(z, q, p), pow(a, q, p), pow(a, (q + 1) // 2, p)
    while t != 1:
        i, t2 = 0, t
        while t2 != 1:
            t2 = t2 * t2 % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        m, c = i, b * b % p
        t = t * c % p
        r = r * b % p
    return r


# --- Pure-Python Pallas curve (Jacobian coordinates) ------------------------
# Oracle implementation; not performance-relevant.

INF = None  # point at infinity in affine form is represented as None


def on_curve(P) -> bool:
    if P is INF:
        return True
    x, y = P
    return (y * y - (x * x * x + B_COEFF)) % Q == 0


def p_add(P, Qp):
    """Affine addition (oracle)."""
    if P is INF:
        return Qp
    if Qp is INF:
        return P
    x1, y1 = P
    x2, y2 = Qp
    if x1 == x2:
        if (y1 + y2) % Q == 0:
            return INF
        # doubling
        lam = (3 * x1 * x1) * inv_mod(2 * y1, Q) % Q
    else:
        lam = (y2 - y1) * inv_mod(x2 - x1, Q) % Q
    x3 = (lam * lam - x1 - x2) % Q
    y3 = (lam * (x1 - x3) - y1) % Q
    return (x3, y3)


def p_neg(P):
    if P is INF:
        return INF
    x, y = P
    return (x, (-y) % Q)


def p_mul(k: int, P):
    """Affine scalar multiplication (oracle), double-and-add."""
    k %= R
    acc = INF
    while k:
        if k & 1:
            acc = p_add(acc, P)
        P = p_add(P, P)
        k >>= 1
    return acc


def p_msm(scalars, points):
    """Oracle MSM."""
    acc = INF
    for s, P in zip(scalars, points):
        acc = p_add(acc, p_mul(s, P))
    return acc


# Montgomery constant used by arkworks' internal representation; needed only
# to decode the reference's consts.rs limbs (stored in Montgomery form).
ARK_MONT_R = 1 << 256


def from_ark_montgomery(limbs64, p: int) -> int:
    """Decode an arkworks BigInt([u64;4]) Montgomery-form value to an int."""
    v = 0
    for i, l in enumerate(limbs64):
        v |= int(l) << (64 * i)
    return v * inv_mod(ARK_MONT_R % p, p) % p
