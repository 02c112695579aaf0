"""Dense univariate polynomial ops over Fr, vectorized in JAX.

Replaces ark-poly's DensePolynomial usage (/root/reference/code/src/pcdl.rs
evaluate/+/*; acc.rs:85-106).  Coefficient vectors live on device as
(L=18, n) Fr limb arrays; evaluation uses a log-depth powers construction +
dot product instead of sequential Horner (Horner's n-step dependency chain
would serialize the VPU).

The h(X) "magic polynomial" of the IPA is expanded by its tensor structure
  h(X) = prod_i (1 + xi_{lg n - i} X^{2^i})
    =>  coeffs = (1, xi_lg) o (1, xi_{lg-1}) o ... (Kronecker),
proved by the reference's own test (pcdl.rs:486-509); the reference instead
multiplies dense polynomials in a loop (pcdl.rs:56-77), which is O(n lg n)
and serial.  Here it is lg n vectorized scales + concats: O(n) muls total.
"""

from __future__ import annotations

import jax.numpy as jnp

from halo_accumulation_tpu.ops.field import FR


def powers(z_limbs, n: int):
    """[1, z, z^2, ..., z^(n-1)] as (L, n) from a (L,) scalar.

    Log-depth doubling: P_{2k} = [P_k, z^k * P_k]
    (mirrors construct_powers, /root/reference/code/src/group.rs:29-37)."""
    cur = FR.from_int(1, (1,))
    zz = z_limbs[:, None]  # z^(2^t)
    while cur.shape[1] < n:
        cur = jnp.concatenate([cur, FR.mul(zz, cur)], axis=1)
        if cur.shape[1] < n:
            zz = FR.mul(zz, zz)
    return cur[:, :n]


def eval_poly(coeffs, z_limbs):
    """p(z) for coeffs (L, n): dot(coeffs, powers(z, n)). Returns (L,)."""
    n = coeffs.shape[1]
    pw = powers(z_limbs, n)
    return FR.sum_along(FR.mul(coeffs, pw), 0)


def scale(coeffs, s_limbs):
    return FR.mul(s_limbs[:, None], coeffs)


def add(a, b):
    """Polynomial addition with zero-padding to the longer length."""
    na, nb = a.shape[1], b.shape[1]
    if na < nb:
        a = jnp.concatenate([a, FR.zeros((nb - na,))], axis=1)
    elif nb < na:
        b = jnp.concatenate([b, FR.zeros((na - nb,))], axis=1)
    return FR.add(a, b)


def tensor_h_coeffs(xis):
    """Coefficients of h(X) from challenges xis (L, lg_n + 1).

    xis[:, 0] is unused in the product (matches HPoly::get_poly,
    /root/reference/code/src/pcdl.rs:56-77: the factor for X^(2^i) uses
    xi_{lg n - i}).  Returns (L, 2^lg_n)."""
    lg_n = xis.shape[1] - 1
    c = FR.from_int(1, (1,))
    for i in range(lg_n):
        xi = xis[:, lg_n - i]
        c = jnp.concatenate([c, FR.mul(xi[:, None], c)], axis=1)
    return c


def h_eval_host(xis_ints: list[int], z: int, r: int) -> int:
    """O(lg n) evaluation of h at z, host ints (HPoly::eval,
    /root/reference/code/src/pcdl.rs:79-91)."""
    lg_n = len(xis_ints) - 1
    v = (1 + xis_ints[lg_n] * z) % r
    z_i = z
    for i in range(1, lg_n):
        z_i = z_i * z_i % r
        v = v * (1 + xis_ints[lg_n - i] * z_i) % r
    return v
