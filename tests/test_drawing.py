"""Vector-graphics drawing primitives (utils/drawing.py) vs the reference's
semantic contract (src/visualization/drawing/*): coverage, caps, ordering,
world-range conversion, frustum geometry."""

import jax
import jax.numpy as jnp
import numpy as np

from styl3r_tpu.utils.drawing import (
    compute_aabb,
    compute_equal_aabb_with_margin,
    draw_cameras,
    draw_lines,
    draw_points,
    generate_conversions,
    unproject_frustum_corners,
)


def test_draw_lines_coverage_and_caps():
    img = jnp.zeros((32, 64, 3), jnp.float32)
    out = draw_lines(img, [[8, 16]], [[40, 16]], color=(1, 0, 0), width=4)
    out = np.asarray(out)
    # Solid red on the spine, black far away.
    np.testing.assert_allclose(out[16, 24], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[4, 24], [0, 0, 0], atol=1e-6)
    # Anti-aliased edge: a pixel center landing exactly on the half-width
    # boundary gets partial coverage (width 3 -> boundary at d=1.5 = row 17's
    # distance from the y=16 spine).
    aa = np.asarray(draw_lines(img, [[8, 16]], [[40, 16]], color=(1, 0, 0), width=3))
    assert 0.05 < aa[17, 24, 0] < 0.95

    # butt cap stops at the endpoint; round cap extends half a width beyond.
    butt = np.asarray(
        draw_lines(img, [[8, 16]], [[40, 16]], color=(1, 1, 1), width=4, cap="butt")
    )
    rnd = np.asarray(
        draw_lines(img, [[8, 16]], [[40, 16]], color=(1, 1, 1), width=4, cap="round")
    )
    assert butt[16, 41, 0] < 0.05 < rnd[16, 41, 0]

    # Later lines paint over earlier ones (reference argmax-by-index rule).
    both = np.asarray(
        draw_lines(
            img,
            [[8, 16], [24, 0]],
            [[40, 16], [24, 31]],
            color=[[1, 0, 0], [0, 1, 0]],
            width=[4, 4],
        )
    )
    np.testing.assert_allclose(both[16, 24], [0, 1, 0], atol=1e-6)

    # jit-compatible (the whole point of the SDF formulation).
    jitted = jax.jit(
        lambda im, s, e: draw_lines(im, s, e, color=(1, 1, 1), width=2.0)
    )
    np.testing.assert_allclose(
        np.asarray(jitted(img, jnp.asarray([[8.0, 16.0]]), jnp.asarray([[40.0, 16.0]]))),
        np.asarray(draw_lines(img, [[8, 16]], [[40, 16]], color=(1, 1, 1), width=2)),
    )


def test_draw_lines_world_range_conversion():
    """x_range/y_range map world coordinates onto pixels
    (coordinate_conversion.py:19-44)."""
    img = jnp.zeros((20, 20, 3), jnp.float32)
    out = np.asarray(
        draw_lines(
            img, [[-1, 0]], [[1, 0]], color=(1, 1, 1), width=2,
            x_range=(-1, 1), y_range=(-1, 1),
        )
    )
    # World y=0 is pixel row 10; the horizontal line spans the full width.
    assert out[10, 2, 0] > 0.9 and out[10, 17, 0] > 0.9
    assert out[3, 10, 0] < 0.05

    w2p, p2w = generate_conversions((20, 20), (-1, 1), (-1, 1))
    np.testing.assert_allclose(np.asarray(w2p(jnp.asarray([0.0, 0.0]))), [10, 10])
    np.testing.assert_allclose(
        np.asarray(p2w(w2p(jnp.asarray([0.3, -0.7])))), [0.3, -0.7], atol=1e-6
    )


def test_draw_points_disc_and_annulus():
    img = jnp.zeros((32, 32, 3), jnp.float32)
    disc = np.asarray(draw_points(img, [[16, 16]], color=(0, 0, 1), radius=5))
    np.testing.assert_allclose(disc[16, 16], [0, 0, 1], atol=1e-6)
    assert disc[16, 23, 2] < 0.05

    ring = np.asarray(
        draw_points(img, [[16, 16]], color=(0, 0, 1), radius=6, inner_radius=3)
    )
    assert ring[16, 16, 2] < 0.05  # carved center
    assert ring[16, 16 + 5, 2] > 0.9  # painted ring


def test_frustum_corners_identity_camera():
    """Golden: identity pose, fx=fy=1, c=(0.5, 0.5) -> corners at depth d are
    d * (+-0.5, +-0.5, 1) in circular order (cameras.py:169-195)."""
    ext = jnp.eye(4)[None]
    k = jnp.asarray([[[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]]])
    corners = np.asarray(unproject_frustum_corners(ext, k, jnp.asarray([2.0])))[0]
    want = 2.0 * np.asarray(
        [[-0.5, -0.5, 1], [0.5, -0.5, 1], [0.5, 0.5, 1], [-0.5, 0.5, 1]]
    )
    np.testing.assert_allclose(corners, want, atol=1e-5)

    mn, mx = compute_aabb(ext, k, near=jnp.asarray([1.0]), far=jnp.asarray([4.0]))
    np.testing.assert_allclose(np.asarray(mn), [-2, -2, 0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(mx), [2, 2, 4], atol=1e-5)
    emn, emx = compute_equal_aabb_with_margin(mn, mx, margin=0.1)
    np.testing.assert_allclose(np.asarray(emx - emn), [4.4, 4.4, 4.4], atol=1e-4)


def test_draw_cameras_projections():
    rng = np.random.default_rng(3)
    b = 3
    ext = np.broadcast_to(np.eye(4, dtype=np.float32), (b, 4, 4)).copy()
    ext[:, :3, 3] = rng.normal(0, 1, (b, 3))
    k = np.broadcast_to(
        np.asarray([[1.0, 0, 0.5], [0, 1.0, 0.5], [0, 0, 1]], np.float32), (b, 3, 3)
    )
    imgs = draw_cameras(
        64, ext, k, color=[[1, 0, 0], [0, 1, 0], [0, 0, 1]],
        near=0.5, far=3.0, label=False,
    )
    assert imgs.shape == (3, 64, 64, 3)
    for i in range(3):  # every projection actually drew something
        assert imgs[i].max() > 0.5
        assert imgs[i].min() >= 0.0
