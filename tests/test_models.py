"""MRI model family: trajectories, SENSE operator, CG-SENSE recon."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensorflow_nufft_tpu.models import mri
from tensorflow_nufft_tpu.planar import from_planar


def test_radial_trajectory_range():
    pts = mri.radial_trajectory(8, 32)
    assert pts.shape == (256, 2)
    assert np.all(np.abs(pts) <= np.pi)
    radii = np.hypot(pts[:, 0], pts[:, 1])
    assert radii.max() == pytest.approx(np.pi, rel=1e-5)


def test_planar_helpers():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((5, 2)).astype(np.float32)
    b = rng.standard_normal((5, 2)).astype(np.float32)
    ac = a[:, 0] + 1j * a[:, 1]
    bc = b[:, 0] + 1j * b[:, 1]
    np.testing.assert_allclose(from_planar(mri.pmul(a, b)), ac * bc,
                               rtol=1e-6)
    np.testing.assert_allclose(from_planar(mri.pconj(a)), np.conj(ac),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mri.pabs2(a)), np.abs(ac) ** 2,
                               rtol=1e-6)


def test_birdcage_maps_sos():
    maps = mri.birdcage_maps(8, (32, 32))
    sos = np.sum(maps[..., 0] ** 2 + maps[..., 1] ** 2, axis=0)
    # Center of the FOV should be well covered.
    assert abs(sos[16, 16] - 1.0) < 0.05


def test_sense_adjointness():
    """<A x, y> == <x, A^H y> (without density compensation)."""
    rng = np.random.default_rng(1)
    grid = (32, 32)
    coils = 4
    pts = mri.radial_trajectory(12, 32)
    maps = mri.birdcage_maps(coils, grid)
    op = mri.SenseNufft(pts, maps, grid)
    x = rng.standard_normal(grid + (2,)).astype(np.float32)
    y = rng.standard_normal((coils, pts.shape[0], 2)).astype(np.float32)
    ax = op.forward(jnp.asarray(x))
    ahy = op.adjoint(jnp.asarray(y))
    lhs = complex(np.vdot(from_planar(np.asarray(ax)),
                          from_planar(y)))
    rhs = complex(np.vdot(from_planar(np.asarray(x)),
                          from_planar(np.asarray(ahy))))
    # forward uses exp(-i), adjoint backward uses exp(+i): true adjoint
    # pair, so the complex inner products agree.
    assert lhs == pytest.approx(rhs, rel=2e-3)


def test_cg_sense_reconstructs_phantom():
    """End-to-end: simulate radial multicoil data, reconstruct, compare."""
    grid = (32, 32)
    coils = 4
    spokes, samples = 48, 64     # well-oversampled for a 32x32 grid
    pts = mri.radial_trajectory(spokes, samples)
    maps = mri.birdcage_maps(coils, grid)
    phantom = mri.shepp_logan(grid)
    density = mri.radial_density(spokes, samples)
    op = mri.SenseNufft(pts, maps, grid, density=jnp.asarray(density))
    kspace = op.forward(jnp.asarray(phantom))
    recon = cg = mri.cg_sense(kspace, op, num_iters=15)
    err = (np.linalg.norm(np.asarray(recon) - phantom)
           / np.linalg.norm(phantom))
    assert err < 0.15, f"CG-SENSE relative error too high: {err:.3f}"


def test_cg_sense_jit_and_grad():
    grid = (16, 16)
    pts = mri.radial_trajectory(24, 32)
    maps = mri.birdcage_maps(2, grid)
    op = mri.SenseNufft(pts, maps, grid)
    phantom = jnp.asarray(mri.shepp_logan(grid))
    kspace = op.forward(phantom)

    @jax.jit
    def recon_loss(ksp):
        rec = mri.cg_sense(ksp, op, num_iters=5)
        return jnp.sum((rec - phantom) ** 2)

    loss, grad = jax.value_and_grad(recon_loss)(kspace)
    assert np.isfinite(float(loss))
    assert np.all(np.isfinite(np.asarray(grad)))


def test_sense_planned_matches_unplanned():
    """The planned SENSE pair (forced Pallas, interpret mode on CPU)
    matches the unplanned pipeline bit-for-bit in structure and to
    float32 tolerance in values, forward and adjoint."""
    import tensorflow_nufft_tpu as tfft

    grid = (32, 32)
    pts = jnp.asarray(mri.radial_trajectory(16, 64))
    maps = jnp.asarray(mri.birdcage_maps(4, grid))
    img = jnp.asarray(mri.shepp_logan(grid))
    density = jnp.asarray(mri.radial_density(16, 64))

    forced = tfft.Options(backend="pallas")
    op_p = mri.SenseNufft(pts, maps, grid, density=density,
                          options=forced, planned=True)
    op_u = mri.SenseNufft(pts, maps, grid, density=density,
                          planned=False)
    assert op_p._t2 is not None and op_p._t2._planned

    ksp_p = np.asarray(op_p.forward(img))
    ksp_u = np.asarray(op_u.forward(img))
    scale = np.max(np.abs(ksp_u))
    np.testing.assert_allclose(ksp_p, ksp_u, atol=2e-5 * scale)

    rec_p = np.asarray(op_p.adjoint(jnp.asarray(ksp_u)))
    rec_u = np.asarray(op_u.adjoint(jnp.asarray(ksp_u)))
    scale = np.max(np.abs(rec_u))
    np.testing.assert_allclose(rec_p, rec_u, atol=2e-5 * scale)


def test_sense_planned_gradient():
    """jax.grad flows through the planned SENSE data-consistency loss."""
    import tensorflow_nufft_tpu as tfft

    grid = (16, 16)
    pts = jnp.asarray(mri.radial_trajectory(8, 32))
    maps = jnp.asarray(mri.birdcage_maps(2, grid))
    img = jnp.asarray(mri.shepp_logan(grid))
    op = mri.SenseNufft(pts, maps, grid,
                        options=tfft.Options(backend="pallas"),
                        planned=True)
    assert op._t2 is not None and op._t2._planned
    kspace = op.forward(img)

    def loss(x):
        r = op.forward(x) - kspace
        return jnp.sum(r * r)

    g = jax.jit(jax.grad(loss))(img * 0.5)
    assert np.isfinite(np.asarray(g)).all()
    # loss is quadratic: grad at 0.5*img is -0.5 * grad-at-1.5x... just
    # check descent: a small step reduces the loss.
    l0 = float(loss(img * 0.5))
    l1 = float(loss(img * 0.5 - 1e-3 * g / (jnp.linalg.norm(g) + 1e-30)))
    assert l1 < l0


def test_sense_toeplitz_normal_matches_composed():
    """SenseNufft(toeplitz=True): the embedded normal matches
    adjoint(forward(.)) at the tolerance level, and cg_sense converges
    with it."""
    grid = (32, 32)
    pts = jnp.asarray(mri.radial_trajectory(16, 64))
    maps = jnp.asarray(mri.birdcage_maps(4, grid))
    img = jnp.asarray(mri.shepp_logan(grid))
    density = jnp.asarray(mri.radial_density(16, 64))

    op_t = mri.SenseNufft(pts, maps, grid, density=density,
                          planned=False, toeplitz=True)
    op_u = mri.SenseNufft(pts, maps, grid, density=density,
                          planned=False)
    assert op_t._toeplitz is not None

    ref = np.asarray(op_u.normal(img))
    got = np.asarray(op_t.normal(img))
    np.testing.assert_allclose(got, ref, atol=1e-3 * np.abs(ref).max())

    ksp = op_u.forward(img)
    rec_t = np.asarray(mri.cg_sense(ksp, op_t, num_iters=8))
    rec_u = np.asarray(mri.cg_sense(ksp, op_u, num_iters=8))
    np.testing.assert_allclose(rec_t, rec_u,
                               atol=2e-3 * np.abs(rec_u).max())


def test_pipe_menon_density():
    """Pipe-Menon weights flatten the convolved density, agree with the
    analytic radial ramp in shape, and give a unit-gain adjoint recon
    at least as good as the ramp's."""
    import jax.numpy as jnp
    from tensorflow_nufft_tpu import planar

    grid = (64, 64)
    spokes, samples = 64, 128
    pts = jnp.asarray(mri.radial_trajectory(spokes, samples))
    w = np.asarray(jax.jit(
        lambda p: mri.pipe_menon_density(p, grid))(pts))
    assert w.shape == (spokes * samples,)
    assert np.all(w > 0)
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)

    # Shape agreement with the analytic ramp (radial ground truth).
    ramp = np.asarray(mri.radial_density(spokes, samples))
    ramp = ramp / ramp.sum()
    assert np.corrcoef(w, ramp)[0, 1] > 0.85

    # Unit-gain adjoint recon: at least as good as the analytic ramp.
    phantom = jnp.asarray(mri.shepp_logan(grid))
    ksp = planar.nufft(phantom[None], pts, transform_type="type_2")

    def adj(wts):
        return planar.nufft(ksp * wts[None, :, None], pts,
                            grid_shape=grid, transform_type="type_1",
                            fft_direction="backward")[0]

    ref = np.asarray(phantom)
    err_pm = np.linalg.norm(np.asarray(adj(jnp.asarray(w))) - ref) \
        / np.linalg.norm(ref)
    err_ramp = np.linalg.norm(
        np.asarray(adj(jnp.asarray(ramp))) - ref) / np.linalg.norm(ref)
    assert err_pm <= err_ramp * 1.05
    assert err_pm < 1.0


def test_pipe_menon_density_errors():
    with pytest.raises(ValueError, match="rank"):
        mri.pipe_menon_density(np.zeros((10, 2), np.float32), (16,))
    with pytest.raises(ValueError, match="shape"):
        mri.pipe_menon_density(np.zeros((10,), np.float32), (16,))
