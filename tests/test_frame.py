"""Frame fusion modes and keyframe arena semantics."""

import jax.numpy as jnp
import numpy as np

from mast3r_slam_tpu.frame import (
    FilteringMode,
    arena_append,
    arena_get,
    arena_pop_last,
    arena_set,
    arena_update_poses,
    make_arena,
    make_empty_frame,
    update_pointmap,
)

H, W, NP, FD = 8, 12, 6, 16
HW = H * W


def mk(x_val, c_val):
    X = jnp.full((HW, 3), float(x_val))
    C = jnp.full((HW, 1), float(c_val))
    return X, C


def test_first_update_sets():
    f = make_empty_frame(H, W, NP, FD)
    X, C = mk(1.0, 2.0)
    for mode in FilteringMode:
        g = update_pointmap(f, X, C, mode)
        np.testing.assert_allclose(g.X_canon, X)
        np.testing.assert_allclose(g.C, C)
        assert int(g.N) == 1 and int(g.N_updates) == 1


def test_weighted_pointmap_fusion():
    f = make_empty_frame(H, W, NP, FD)
    X1, C1 = mk(1.0, 1.0)
    X2, C2 = mk(3.0, 3.0)
    f = update_pointmap(f, X1, C1, FilteringMode.WEIGHTED_POINTMAP)
    f = update_pointmap(f, X2, C2, FilteringMode.WEIGHTED_POINTMAP)
    # (1*1 + 3*3)/(1+3) = 2.5
    np.testing.assert_allclose(f.X_canon, 2.5)
    np.testing.assert_allclose(f.C, 4.0)
    assert int(f.N) == 2
    # average conf = C / N
    np.testing.assert_allclose(f.get_average_conf(), 2.0)


def test_recent_and_indep_conf():
    f = make_empty_frame(H, W, NP, FD)
    X1, C1 = mk(1.0, 5.0)
    X2, C2 = mk(2.0, 1.0)
    g = update_pointmap(
        update_pointmap(f, X1, C1, FilteringMode.RECENT),
        X2, C2, FilteringMode.RECENT,
    )
    np.testing.assert_allclose(g.X_canon, 2.0)
    h = update_pointmap(
        update_pointmap(f, X1, C1, FilteringMode.INDEP_CONF),
        X2, C2, FilteringMode.INDEP_CONF,
    )
    # second update has lower conf everywhere -> kept first
    np.testing.assert_allclose(h.X_canon, 1.0)
    np.testing.assert_allclose(h.C, 5.0)


def test_best_score():
    f = make_empty_frame(H, W, NP, FD)
    X1, C1 = mk(1.0, 1.0)
    X2, C2 = mk(2.0, 3.0)
    X3, C3 = mk(9.0, 2.0)
    f = update_pointmap(f, X1, C1, FilteringMode.BEST_SCORE)
    f = update_pointmap(f, X2, C2, FilteringMode.BEST_SCORE)
    f = update_pointmap(f, X3, C3, FilteringMode.BEST_SCORE)  # lower: ignored
    np.testing.assert_allclose(f.X_canon, 2.0)


def test_weighted_spherical_roundtrip():
    f = make_empty_frame(H, W, NP, FD)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((HW, 3)) + 3.0, dtype=jnp.float32)
    C = jnp.ones((HW, 1))
    f = update_pointmap(f, X, C, FilteringMode.WEIGHTED_SPHERICAL)
    g = update_pointmap(f, X, C, FilteringMode.WEIGHTED_SPHERICAL)
    # fusing the same map with itself must be (nearly) idempotent
    np.testing.assert_allclose(g.X_canon, X, atol=1e-4)


def test_arena_roundtrip():
    arena = make_arena(4, H, W, NP, FD)
    f = make_empty_frame(H, W, NP, FD)
    f = f.replace(frame_id=jnp.asarray(7, jnp.int32),
                  X_canon=jnp.full((HW, 3), 1.5))
    arena = arena_append(arena, f)
    assert int(arena.n_size) == 1
    g = arena_get(arena, 0)
    assert int(g.frame_id) == 7
    np.testing.assert_allclose(g.X_canon, 1.5)

    f2 = f.replace(frame_id=jnp.asarray(9, jnp.int32))
    arena = arena_append(arena, f2)
    assert int(arena.n_size) == 2
    # last_keyframe analog
    last = arena_get(arena, arena.n_size - 1)
    assert int(last.frame_id) == 9
    arena = arena_pop_last(arena)
    assert int(arena.n_size) == 1
    # overwrite slot
    arena = arena_set(arena, 0, f2)
    assert int(arena_get(arena, 0).frame_id) == 9


def test_arena_update_poses():
    from mast3r_slam_tpu.ops import lie_sim3 as sim3

    arena = make_arena(4, H, W, NP, FD)
    T = sim3.exp(jnp.asarray([[0.1, 0, 0, 0, 0, 0, 0.2]]))
    arena = arena_update_poses(arena, T, jnp.asarray([2]))
    np.testing.assert_allclose(arena.T_WC[2], T[0], atol=1e-6)
    np.testing.assert_allclose(arena.T_WC[0], sim3.identity(), atol=1e-6)
