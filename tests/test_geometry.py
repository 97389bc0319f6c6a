"""Geometry Jacobians vs jax autodiff; backprojection/projection roundtrips."""

import jax
import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.ops import geometry as geom


def test_point_to_ray_dist_jacobian(rng):
    X = jnp.asarray(rng.standard_normal((16, 3)) + 3.0, dtype=jnp.float32)
    rd, J = geom.point_to_ray_dist(X, jacobian=True)
    assert rd.shape == (16, 4) and J.shape == (16, 4, 3)
    J_auto = jax.vmap(jax.jacfwd(lambda x: geom.point_to_ray_dist(x)))(X)
    np.testing.assert_allclose(J, J_auto, atol=1e-5)
    np.testing.assert_allclose(
        jnp.linalg.norm(rd[:, :3], axis=-1), 1.0, atol=1e-6
    )


def test_project_calib_jacobian(rng):
    K = jnp.asarray([[300.0, 0, 128], [0, 300.0, 96], [0, 0, 1]])
    P = jnp.asarray(rng.standard_normal((32, 3)), dtype=jnp.float32)
    P = P.at[:, 2].set(jnp.abs(P[:, 2]) + 1.0)
    pz, J, valid = geom.project_calib(P, K, (192, 256), jacobian=True)

    def f(p):
        out, _ = geom.project_calib(p, K, (192, 256))
        return out

    J_auto = jax.vmap(jax.jacfwd(f))(P)
    np.testing.assert_allclose(J, J_auto, atol=1e-4)


def test_project_backproject_roundtrip(rng):
    K = jnp.asarray([[300.0, 0, 128], [0, 300.0, 96], [0, 0, 1]])
    uv = jnp.asarray(rng.uniform(0, 200, size=(20, 2)), dtype=jnp.float32)
    z = jnp.asarray(rng.uniform(0.5, 5.0, size=(20, 1)), dtype=jnp.float32)
    P = geom.backproject(uv, z, K)
    pz, valid = geom.project_calib(P, K, (192, 256), border=-1000)
    np.testing.assert_allclose(pz[:, :2], uv, atol=1e-3)
    np.testing.assert_allclose(pz[:, 2:3], jnp.log(z), atol=1e-5)


def test_constrain_points_to_ray(rng):
    K = jnp.asarray([[100.0, 0, 32], [0, 100.0, 24], [0, 0, 1]])
    h, w = 48, 64
    X = jnp.asarray(rng.standard_normal((1, h * w, 3)), dtype=jnp.float32)
    X = X.at[..., 2].set(jnp.abs(X[..., 2]) + 1.0)
    Xc = geom.constrain_points_to_ray((h, w), X, K)
    # Depth preserved
    np.testing.assert_allclose(Xc[..., 2], X[..., 2], atol=1e-6)
    # Constrained points project exactly onto the pixel grid
    pz, _ = geom.project_calib(Xc, K, (h, w), border=-10000)
    uv = geom.get_pixel_coords(1, (h, w)).reshape(1, -1, 2)
    np.testing.assert_allclose(pz[..., :2], uv, atol=1e-3)


def test_pixel_coords_order():
    uv = geom.get_pixel_coords(1, (2, 3))
    # (u, v) ordering: u varies along width
    np.testing.assert_allclose(uv[0, 0, :, 0], [0, 1, 2])
    np.testing.assert_allclose(uv[0, :, 0, 1], [0, 1])


def test_img_gradient_matches_conv(rng):
    """Shifted-add Scharr equals explicit conv with reflect padding."""
    from mast3r_slam_tpu.ops.image import img_gradient

    img = jnp.asarray(rng.standard_normal((2, 8, 10, 3)), dtype=jnp.float32)
    gx, gy = img_gradient(img)

    kx = np.array([[-3, 0, 3], [-10, 0, 10], [-3, 0, 3]], dtype=np.float32) / 32
    ky = kx.T
    p = np.pad(np.asarray(img), ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    gx_ref = np.zeros_like(img)
    gy_ref = np.zeros_like(img)
    for dy in range(3):
        for dx in range(3):
            gx_ref += kx[dy, dx] * p[:, dy:dy + 8, dx:dx + 10, :]
            gy_ref += ky[dy, dx] * p[:, dy:dy + 8, dx:dx + 10, :]
    np.testing.assert_allclose(gx, gx_ref, atol=1e-5)
    np.testing.assert_allclose(gy, gy_ref, atol=1e-5)


def test_huber_tukey():
    from mast3r_slam_tpu.ops.robust import huber, tukey

    r = jnp.asarray([-3.0, -0.5, 0.0, 0.5, 3.0])
    w = huber(r, k=1.345)
    np.testing.assert_allclose(w[2], 1.0)
    np.testing.assert_allclose(w[0], 1.345 / 3.0, rtol=1e-6)
    wt = tukey(r, t=4.6851)
    assert float(wt[2]) == 1.0
    assert float(tukey(jnp.asarray([5.0]), t=4.6851)[0]) == 0.0


def test_solve_spd_small_matches_cholesky():
    import jax
    import jax.numpy as jnp
    from mast3r_slam_tpu.ops.robust import solve_spd_small

    key = jax.random.PRNGKey(0)
    for i in range(5):
        key, k1, k2 = jax.random.split(key, 3)
        A = jax.random.normal(k1, (7, 7))
        H = A @ A.T + 7 * jnp.eye(7)
        g = jax.random.normal(k2, (7,))
        x, ok = solve_spd_small(H, g)
        assert bool(ok)
        x_ref = jnp.linalg.solve(H, g)
        assert jnp.allclose(x, x_ref, atol=1e-4), (x, x_ref)

    # indefinite matrix -> ok False, finite output
    H_bad = jnp.diag(jnp.asarray([1.0, -1.0, 1, 1, 1, 1, 1]))
    x, ok = solve_spd_small(H_bad, jnp.ones((7,)))
    assert not bool(ok)
    assert bool(jnp.all(jnp.isfinite(x)))


def test_solve_spd_small_badly_scaled():
    """Jacobi pre-scaling regression: a Sim(3)-like normal-equation matrix
    whose rotation/scale rows are ~depth^2 larger than the translation
    rows (depth ~300 -> condition ~1e10, beyond fp32) must still solve —
    the unscaled fp32 LDL^T loses its pivots exactly like the in-pipeline
    failures at production resolution (frames with match_frac 0.82
    returning ok=False)."""
    import numpy as np

    from mast3r_slam_tpu.ops.robust import solve_spd_small

    rng = np.random.default_rng(0)
    B = rng.standard_normal((40, 7))
    col = np.array([1.0, 1.0, 1.0, 300.0, 300.0, 300.0, 300.0])
    B = B * col[None, :]
    H64 = (B.T @ B).astype(np.float64)
    g64 = rng.standard_normal(7)
    x64 = np.linalg.solve(H64, g64)

    x, ok = solve_spd_small(jnp.asarray(H64, jnp.float32),
                            jnp.asarray(g64, jnp.float32))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(x), x64, rtol=2e-2, atol=1e-8)
