"""Unit tests for the geometry core (cameras, SH, covariance transforms)."""

import numpy as np
import jax.numpy as jnp

from seganygaussians_tpu.ops import camera as cam
from seganygaussians_tpu.ops import sh as sh_mod
from seganygaussians_tpu.ops import transforms


def random_pose(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    r, x, y, z = q
    R = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)],
            [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)],
            [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    t = rng.normal(size=3)
    return R, t


def test_world2view_roundtrip(rng):
    R, t = random_pose(rng)
    w2v = cam.get_world2view(R, t)
    # Camera center maps to origin.
    c2w = np.linalg.inv(w2v)
    center = c2w[:3, 3]
    mapped = w2v[:3, :3] @ center + w2v[:3, 3]
    np.testing.assert_allclose(mapped, 0.0, atol=1e-5)


def test_projection_matrix_matches_reference_formula():
    znear, zfar = 0.01, 100.0
    fovx, fovy = 1.2, 0.9
    P = cam.get_projection_matrix(znear, zfar, fovx, fovy)
    # A point on the near plane center projects to z=0, on optical axis to x=y=0.
    p = np.array([0.0, 0.0, znear, 1.0])
    clip = P @ p
    ndc = clip[:3] / clip[3]
    np.testing.assert_allclose(ndc, [0, 0, 0], atol=1e-6)
    # Point at the edge of the frustum maps to x = ±1.
    x_edge = znear * np.tan(fovx / 2)
    clip = P @ np.array([x_edge, 0.0, znear, 1.0])
    np.testing.assert_allclose(clip[0] / clip[3], 1.0, atol=1e-5)


def test_camera_projection_pipeline(rng):
    R, t = random_pose(rng)
    c = cam.make_camera(R, t, fovx=1.1, fovy=0.9, width=64, height=48)
    # A point in front of the camera center projects inside NDC.
    c2w = np.linalg.inv(cam.get_world2view(R, t))
    center, forward = c2w[:3, 3], c2w[:3, 2]
    p = center + 3.0 * forward
    hom = np.concatenate([p, [1.0]]) @ np.asarray(c.full_proj)
    ndc = hom[:3] / (hom[3] + 1e-7)
    assert abs(ndc[0]) < 1e-3 and abs(ndc[1]) < 1e-3
    pv = np.concatenate([p, [1.0]]) @ np.asarray(c.world_view)
    np.testing.assert_allclose(pv[2], 3.0, atol=1e-5)


def test_eval_sh_degree0_constant():
    shc = jnp.ones((5, 3, 1))
    out = sh_mod.eval_sh(0, shc, jnp.ones((5, 3)))
    np.testing.assert_allclose(out, sh_mod.SH_C0, atol=1e-6)


def test_eval_sh_matches_reference_polynomials(rng):
    # Cross-check degree-3 against an independent direct evaluation.
    sh = rng.normal(size=(10, 3, 16)).astype(np.float32)
    dirs = rng.normal(size=(10, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    out = np.asarray(sh_mod.eval_sh(3, jnp.asarray(sh), jnp.asarray(dirs)))

    C0, C1 = 0.28209479177387814, 0.4886025119029199
    C2 = [1.0925484305920792, -1.0925484305920792, 0.31539156525252005, -1.0925484305920792, 0.5462742152960396]
    C3 = [-0.5900435899266435, 2.890611442640554, -0.4570457994644658, 0.3731763325901154, -0.4570457994644658, 1.445305721320277, -0.5900435899266435]
    for i in range(10):
        x, y, z = dirs[i]
        basis = [
            C0,
            -C1 * y, C1 * z, -C1 * x,
            C2[0] * x * y, C2[1] * y * z, C2[2] * (2 * z * z - x * x - y * y),
            C2[3] * x * z, C2[4] * (x * x - y * y),
            C3[0] * y * (3 * x * x - y * y), C3[1] * x * y * z,
            C3[2] * y * (4 * z * z - x * x - y * y),
            C3[3] * z * (2 * z * z - 3 * x * x - 3 * y * y),
            C3[4] * x * (4 * z * z - x * x - y * y), C3[5] * z * (x * x - y * y),
            C3[6] * x * (x * x - 3 * y * y),
        ]
        expect = sh[i] @ np.array(basis)
        np.testing.assert_allclose(out[i], expect, rtol=1e-4, atol=1e-5)


def test_sh_rgb_roundtrip(rng):
    rgb = jnp.asarray(rng.uniform(size=(7, 3)))
    np.testing.assert_allclose(
        sh_mod.sh2rgb(sh_mod.rgb2sh(rgb)), rgb, atol=1e-6
    )


def test_build_rotation_orthonormal(rng):
    q = jnp.asarray(rng.normal(size=(20, 4)).astype(np.float32))
    R = transforms.build_rotation(q)
    eye = jnp.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (20, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)


def test_covariance_psd_and_roundtrip(rng):
    scales = jnp.asarray(np.abs(rng.normal(size=(15, 3))).astype(np.float32) + 0.1)
    quats = jnp.asarray(rng.normal(size=(15, 4)).astype(np.float32))
    packed = transforms.build_covariance_3d(scales, quats)
    full = transforms.unpack_symmetric(packed)
    np.testing.assert_allclose(full, np.swapaxes(np.asarray(full), -1, -2), atol=1e-6)
    eigs = np.linalg.eigvalsh(np.asarray(full))
    assert (eigs > -1e-5).all()
    # Eigenvalues are the squared scales.
    np.testing.assert_allclose(
        np.sort(eigs, axis=-1),
        np.sort(np.asarray(scales) ** 2, axis=-1),
        rtol=1e-3,
        atol=1e-5,
    )


def test_inverse_sigmoid():
    x = jnp.asarray([0.1, 0.5, 0.9])
    np.testing.assert_allclose(
        1 / (1 + np.exp(-np.asarray(transforms.inverse_sigmoid(x)))), x, atol=1e-6
    )
