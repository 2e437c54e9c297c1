"""FlameLbsDecoder math checks (N16): the real FLAME forward pass
(dpl/flame/flame.py:241-312, dpl/flame/lbs.py:148-250) in numpy, validated
analytically — no torch or reference import, just geometry identities.
"""

from __future__ import annotations

import numpy as np
import pytest

from talkinghead_datapipeline_spark.operators.models import FlameLbsDecoder

rng = np.random.default_rng(7)


@pytest.fixture(scope="module")
def dec():
    return FlameLbsDecoder()


def test_rodrigues_identity_and_known_axis(dec):
    R0 = dec._rodrigues(np.zeros((1, 3)))[0]
    np.testing.assert_array_equal(R0, np.eye(3))  # exact at zero pose
    # 90° about z maps x̂→ŷ, ŷ→−x̂, ẑ→ẑ
    Rz = dec._rodrigues(np.array([[0.0, 0.0, np.pi / 2]]))[0]
    want = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    np.testing.assert_allclose(Rz, want, atol=1e-7)
    # any rotation matrix: orthogonal, det 1
    # ~1e-8 deviation is inherent: the reference adds 1e-8 to the vector
    # before taking the norm, so the axis is not exactly unit length.
    R = dec._rodrigues(rng.normal(size=(5, 3)))
    np.testing.assert_allclose(
        R @ np.swapaxes(R, 1, 2), np.broadcast_to(np.eye(3), (5, 3, 3)), atol=1e-7
    )
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-7)


def test_rest_pose_reduces_to_affine(dec):
    """At rest pose every joint transform is the identity, so the whole
    LBS pipeline must equal the blend-shape affine map — the property the
    DuckDB oracle of flame_decode_landmarks checks in SQL."""
    shape = rng.normal(size=8)
    exp = rng.normal(size=8)
    betas = np.concatenate([shape, exp])
    _, lmks = dec.decode(shape, exp)
    for l in range(len(lmks)):
        base, coefs = dec.rest_landmark_affine(l)
        np.testing.assert_allclose(lmks[l], base + coefs @ betas, atol=1e-12)


def test_global_rotation_is_rigid_about_root_joint(dec):
    """With only a global rotation, every world transform shares rotation R
    and translation j0 − R·j0, so verts = R·(v_rest − j0) + j0 — this pins
    the kinematic chain, the rest-pose correction, and the skinning
    normalization all at once."""
    shape = rng.normal(size=8)
    exp = rng.normal(size=8)
    pose = np.array([0.0, 0.0, np.pi / 2, 0.0, 0.0, 0.0])
    v_rest, _ = dec.decode(shape, exp)
    v_rot, _ = dec.decode(shape, exp, pose)
    R = dec._rodrigues(pose[None, :3])[0]
    betas = np.concatenate([shape, exp])
    v_shaped = dec.template + np.einsum("vcl,l->vc", dec.shapedirs, betas)
    j0 = dec.j_regressor[0] @ v_shaped
    np.testing.assert_allclose(v_rest, v_shaped, atol=1e-12)
    np.testing.assert_allclose(v_rot, (v_shaped - j0) @ R.T + j0, atol=1e-9)


def test_jaw_pose_bends_nonrigidly(dec):
    """A jaw-only pose must (a) move vertices, (b) NOT be a global rigid
    motion (different joints move differently), (c) engage the pose
    corrective blendshapes."""
    shape = np.zeros(8)
    exp = np.zeros(8)
    jaw = np.array([0.0, 0.0, 0.0, 0.3, 0.0, 0.0])
    v0, _ = dec.decode(shape, exp)
    v1, _ = dec.decode(shape, exp, jaw)
    disp = np.linalg.norm(v1 - v0, axis=1)
    assert disp.max() > 1e-3
    # not rigid: per-vertex displacement varies with skinning weights
    assert disp.std() / disp.mean() > 0.01


def test_landmarks_are_barycentric_mix_of_face_corners(dec):
    shape = rng.normal(size=8)
    exp = rng.normal(size=8)
    pose = rng.normal(size=6) * 0.2
    verts, lmks = dec.decode(shape, exp, pose)
    for l in (0, len(lmks) - 1):
        corners = verts[dec.faces[dec.lmk_faces_idx[l]]]
        np.testing.assert_allclose(lmks[l], dec.lmk_bary[l] @ corners, atol=1e-12)


def test_decode_batch_matches_single(dec):
    shapes = rng.normal(size=(3, 8))
    exps = rng.normal(size=(3, 8))
    poses = rng.normal(size=(3, 6)) * 0.1
    vb, lb = dec.decode_batch(shapes, exps, poses)
    for i in range(3):
        v, l = dec.decode(shapes[i], exps[i], poses[i])
        np.testing.assert_allclose(vb[i], v, atol=0)
        np.testing.assert_allclose(lb[i], l, atol=0)
