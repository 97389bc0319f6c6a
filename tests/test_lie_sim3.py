"""Unit tests for the Sim(3) library: group axioms, exponential map checked
against brute-force numerical integration, adjoint identity, Jacobians vs
finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mast3r_slam_tpu.ops import lie_sim3 as sim3

jax.config.update("jax_enable_x64", False)


def rand_tangent(rng, n=8, scale=1.0):
    return jnp.asarray(rng.standard_normal((n, 7)) * scale, dtype=jnp.float32)


def rand_group(rng, n=8, scale=1.0):
    return sim3.exp(rand_tangent(rng, n, scale))


def test_identity_act(rng):
    X = jnp.asarray(rng.standard_normal((5, 3)), dtype=jnp.float32)
    T = sim3.identity((5,))
    np.testing.assert_allclose(sim3.act(T, X), X, atol=1e-6)


def test_exp_zero_is_identity():
    T = sim3.exp(jnp.zeros((3, 7)))
    np.testing.assert_allclose(T, sim3.identity((3,)), atol=1e-7)


def test_inverse(rng):
    T = rand_group(rng)
    TT = sim3.mul(T, sim3.inv(T))
    np.testing.assert_allclose(TT, sim3.identity((T.shape[0],)), atol=1e-5)


def test_associativity_action(rng):
    Ta, Tb = rand_group(rng), rand_group(rng)
    X = jnp.asarray(rng.standard_normal((8, 3)), dtype=jnp.float32)
    lhs = sim3.act(sim3.mul(Ta, Tb), X)
    rhs = sim3.act(Ta, sim3.act(Tb, X))
    np.testing.assert_allclose(lhs, rhs, atol=1e-4)


def test_rel(rng):
    Ti, Tj = rand_group(rng), rand_group(rng)
    np.testing.assert_allclose(
        sim3.rel(Ti, Tj), sim3.mul(sim3.inv(Ti), Tj), atol=1e-5
    )


def test_matrix_homomorphism(rng):
    Ta, Tb = rand_group(rng, 4), rand_group(rng, 4)
    M = sim3.sim3_matrix(sim3.mul(Ta, Tb))
    MM = jnp.einsum("nij,njk->nik", sim3.sim3_matrix(Ta), sim3.sim3_matrix(Tb))
    np.testing.assert_allclose(M, MM, atol=1e-4)


def test_exp_matches_matrix_exponential(rng):
    """Sim3 exp translation part: t = W tau with
    W = int_0^1 exp(sigma u) R(u phi) du — check against Riemann integration."""
    xi = rand_tangent(rng, 6, scale=0.8)
    T = sim3.exp(xi)
    tau = np.asarray(xi[:, 0:3], dtype=np.float64)
    phi = np.asarray(xi[:, 3:6], dtype=np.float64)
    sigma = np.asarray(xi[:, 6], dtype=np.float64)

    def rotmat(v):
        th = np.linalg.norm(v)
        if th < 1e-12:
            return np.eye(3)
        k = v / th
        K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
        return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K

    n_steps = 20000
    us = (np.arange(n_steps) + 0.5) / n_steps
    for i in range(xi.shape[0]):
        W = np.zeros((3, 3))
        for u in us:
            W += np.exp(sigma[i] * u) * rotmat(u * phi[i])
        W /= n_steps
        t_expected = W @ tau[i]
        np.testing.assert_allclose(np.asarray(T[i, 0:3]), t_expected, atol=2e-4)
        np.testing.assert_allclose(float(T[i, 7]), np.exp(sigma[i]), rtol=1e-5)
        R_expected = rotmat(phi[i])
        M = np.asarray(sim3.sim3_matrix(T[i]))
        np.testing.assert_allclose(
            M[:3, :3] / float(T[i, 7]), R_expected, atol=1e-4
        )


def test_small_angle_branch_continuity():
    """exp must be continuous across the small-angle/sigma switch."""
    for mag in [1e-8, 1e-5, 1e-4, 5e-4, 1e-3, 1e-2]:
        xi = jnp.full((1, 7), mag, dtype=jnp.float32)
        T = sim3.exp(xi)
        assert bool(jnp.all(jnp.isfinite(T)))
        # First-order: exp(xi) ~ id + xi for tiny xi
        if mag <= 1e-4:
            np.testing.assert_allclose(T[0, 0:3], xi[0, 0:3], rtol=1e-2)


def test_retr_left_composition(rng):
    T = rand_group(rng, 4)
    xi = rand_tangent(rng, 4, 0.3)
    np.testing.assert_allclose(
        sim3.retr(T, xi), sim3.mul(sim3.exp(xi), T), atol=1e-6
    )


def test_act_jac_finite_difference(rng):
    T = rand_group(rng, 1)[0]
    X = jnp.asarray(rng.standard_normal((6, 3)), dtype=jnp.float32)
    pW, J = sim3.act_jac(T, X)
    eps = 1e-3

    for d in range(7):
        dxi = np.zeros(7, dtype=np.float32)
        dxi[d] = eps
        Tp = sim3.retr(T, jnp.asarray(dxi))
        Tm = sim3.retr(T, jnp.asarray(-dxi))
        num = (sim3.act(Tp, X) - sim3.act(Tm, X)) / (2 * eps)
        np.testing.assert_allclose(J[..., d], num, atol=5e-3)


def test_apply_adj_inv_identity(rng):
    """apply_adj_inv(T) on a row vector v equals v @ Adj(T)^-1, where Adj is
    defined by exp(Adj(T) xi) = T exp(xi) T^-1.  Verify via the defining
    relation numerically: for any xi, v . adjinv(T, J_row) pairing must match
    differentiating the conjugated flow."""
    T = rand_group(rng, 1, scale=0.5)[0]
    v = jnp.asarray(rng.standard_normal(7), dtype=jnp.float32)
    out = sim3.apply_adj_inv(T, v)

    # Numerical adjoint: Adj(T)[.,d] = d/de log(T exp(e e_d) T^-1).
    # Instead of a log map, test the pairing through point action:
    # For f(xi) = act(T exp(xi), X0) = act(exp(Adj(T) xi) T, X0),
    # df/dxi = J_left(T X0) @ Adj(T)  where J_left = [I, -skew(p), p].
    X0 = jnp.asarray(rng.standard_normal(3), dtype=jnp.float32)
    eps = 1e-3

    def f(xi):
        return sim3.act(sim3.mul(T, sim3.exp(xi[None])[0]), X0)

    num = np.zeros((3, 7), dtype=np.float64)
    for d in range(7):
        dxi = np.zeros(7, dtype=np.float32)
        dxi[d] = eps
        num[:, d] = np.asarray(
            (f(jnp.asarray(dxi)) - f(jnp.asarray(-dxi))) / (2 * eps)
        )

    p = sim3.act(T, X0)
    Jl = np.concatenate(
        [np.eye(3), -np.asarray(sim3.skew(p)), np.asarray(p)[:, None]], axis=1
    )
    # num = Jl @ Adj(T)  =>  rows of Jl mapped by Adj^T. apply_adj_inv maps
    # row-vectors by Adj^-1... Verify: row r of num should equal
    # apply_adj_inv(inv(T), Jl[r])? Adj(T)^-1 = Adj(T^-1).
    for r in range(3):
        lhs = np.asarray(sim3.apply_adj_inv(sim3.inv(T), jnp.asarray(Jl[r], dtype=jnp.float32)))
        np.testing.assert_allclose(lhs, num[r], atol=2e-2)


def test_as_se3(rng):
    T = rand_group(rng, 3)
    E = sim3.as_se3(T)
    np.testing.assert_allclose(E[..., 7], 1.0, atol=1e-6)
    np.testing.assert_allclose(E[..., 0:7], T[..., 0:7], atol=1e-5)


def test_retr_renormalizes_quaternion(rng):
    """retr must re-impose ||q|| = 1: quat_inv is a conjugate (not a true
    inverse), so rel/mul MULTIPLY quaternion norms and the pipeline's
    kf->frame pose recursion amplifies any norm seed geometrically —
    measured pose blowup (NaN quaternions, 0.56-1.92 fake scale spread)
    by frame ~60 of the 224-frame production-res drive before the fix."""
    T = rand_group(rng, 4)
    T_bad = T.at[..., 3:7].multiply(1.01)  # drifted norm seed
    xi = jnp.asarray(rng.normal(0, 0.1, (4, 7)), jnp.float32)
    out = sim3.retr(T_bad, xi)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out[..., 3:7]), axis=-1), 1.0, atol=1e-6)


def test_pose_recursion_norm_stable(rng):
    """500 iterations of the tracker's pose recursion
    T_f = mul(T_k, GN-retr(rel(T_k, T_f))) keep ||q|| at 1 to fp32
    rounding (the pre-fix recursion diverged from a 1e-7 seed)."""
    T_k = rand_group(rng, 1)[0]
    T_f = rand_group(rng, 1)[0]
    xi = jnp.asarray(rng.normal(0, 0.02, (7,)), jnp.float32)

    @jax.jit
    def step(T_f):
        T_rel = sim3.rel(T_k, T_f)
        return sim3.mul(T_k, sim3.retr(T_rel, xi))

    for _ in range(500):
        T_f = step(T_f)
    n = float(jnp.linalg.norm(T_f[3:7]))
    assert abs(n - 1.0) < 1e-5, n
    assert np.isfinite(np.asarray(T_f)).all()
