"""3D scene graph + software renderer tests (utils/tree.py, utils/scene3d.py;
reference src/utils/{tree,scene_3d}.jl): tree algebra, projection math
against hand calculations, pose composition, painter's z-sorting, OBJ
loading, and an end-to-end render smoke test."""

import math
import os

import numpy as np
import pytest

from scptoolbox_tpu.utils import scene3d as s3
from scptoolbox_tpu.utils.tree import TreeNode, find_common


def test_tree_traverse_findall_lca():
    root = TreeNode("root")
    a = TreeNode("a", root)
    b = TreeNode("b", root)
    aa = TreeNode("aa", a)
    ab = TreeNode("ab", a)
    ba = TreeNode("ba", b)

    order = []
    root.traverse(lambda d, depth: order.append((d, depth)))
    assert order == [("root", 0), ("a", 1), ("aa", 2), ("ab", 2),
                     ("b", 1), ("ba", 2)]
    assert root.findall(lambda d: d.startswith("a")) == ["a", "aa", "ab"]
    assert find_common(aa, ab) is a
    assert find_common(aa, ba) is root
    assert find_common(aa, a) is a

    # reparenting
    ab.set_parent(b)
    assert ab.parent is b and ab not in a.children
    assert find_common(ab, ba) is b
    with pytest.raises(ValueError):
        find_common(aa, TreeNode("stranger"))


def test_frustum_matrix_and_projection():
    """Perspective matrix matches the hand formula and maps known points
    (reference frustum, scene_3d.jl:1157-1188; NDC z: near -> -1,
    far -> +1)."""
    cam = s3.Camera3D(fovy=90.0, aspect=1.0, znear=1.0, zfar=10.0)
    P = s3.perspective(cam)
    # fovy=90 -> h = tan(45 deg) * znear = 1 = w
    assert P[0, 0] == pytest.approx(1.0)
    assert P[1, 1] == pytest.approx(1.0)
    assert P[3, 2] == -1.0

    def proj(pt):
        v = P @ np.asarray([*pt, 1.0])
        return v[:3] / v[3]

    np.testing.assert_allclose(proj((0, 0, -1.0)), [0, 0, -1], atol=1e-12)
    np.testing.assert_allclose(proj((0, 0, -10.0))[2], 1.0, atol=1e-12)
    # point on the near-plane top edge maps to y = +1
    np.testing.assert_allclose(proj((0, 1.0, -1.0))[1], 1.0, atol=1e-12)


def test_relative_pose_chain():
    """Pose composition through the LCA (reference relative_pose,
    scene_3d.jl:1020-1115)."""
    scene = s3.Scene3D()
    body = scene.add(s3.Axis3D(name="body"))
    body.set_pose(s3.homtransf(s3.rot_z(0.5 * math.pi), [1.0, 0.0, 0.0]))
    tip = scene.add(s3.Axis3D(name="tip"), parent=body)
    tip.set_pose(s3.homtransf(t=[2.0, 0.0, 0.0]))
    cam = scene.add(s3.Camera3D(name="cam"))
    cam.set_pose(s3.homtransf(t=[0.0, 0.0, 5.0]))

    H = scene.relative_pose(tip, cam)
    # tip origin in world: body at (1,0,0) rotated z90 -> tip at (1, 2, 0);
    # camera at (0, 0, 5) identity orientation
    np.testing.assert_allclose(H[:3, 3], [1.0, 2.0, -5.0], atol=1e-12)
    np.testing.assert_allclose(H[:3, :3], s3.rot_z(0.5 * math.pi),
                               atol=1e-12)


def test_look_at():
    cam = s3.Camera3D()
    cam.look_at([5.0, 0.0, 0.0], [0.0, 0.0, 0.0])
    R, t = cam.local_pose[:3, :3], cam.local_pose[:3, 3]
    np.testing.assert_allclose(t, [5.0, 0.0, 0.0])
    # camera -z axis (third column negated) points toward the origin
    np.testing.assert_allclose(-R[:, 2], [-1.0, 0.0, 0.0], atol=1e-12)
    # orthonormality
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-12)


def test_sphere_and_box_primitives():
    sph = s3.sphere(2.0, az=12, el=6)
    assert np.allclose(np.linalg.norm(sph.V, axis=1), 2.0)
    assert sph.F.shape[1] == 4 and sph.N is not None
    # outward normals: n . v > 0 at face centers
    ctr = sph.V[sph.F[:, :3]].mean(axis=1)
    assert np.all(np.sum(ctr * sph.N[sph.F[:, 3]], axis=1) > 0)

    bx = s3.box((2.0, 4.0, 6.0), center=(1.0, 0.0, 0.0))
    assert bx.V.shape == (8, 3) and bx.F.shape == (12, 4)
    assert bx.V[:, 0].min() == 0.0 and bx.V[:, 0].max() == 2.0
    assert bx.V[:, 1].min() == -2.0 and bx.V[:, 2].max() == 3.0


def test_bake_zsort_and_clip():
    """Two parallel squares: the nearer one must be drawn LAST (painter's
    algorithm); geometry behind the camera is clipped away."""
    scene = s3.Scene3D()
    cam = scene.add(s3.Camera3D(name="cam", fovy=60.0, znear=0.1,
                                zfar=50.0))
    cam.look_at([0.0, 0.0, 10.0], [0.0, 0.0, 0.0])

    def square(z, color, name):
        V = np.asarray([[-1, -1, z], [1, -1, z], [1, 1, z], [-1, 1, z]],
                       float)
        F = np.asarray([[0, 1, 2], [0, 2, 3]])
        return s3.Mesh3D(V, F, name=name, face_color=color)

    near = scene.add(square(5.0, "red", "near"))
    far = scene.add(square(0.0, "blue", "far"))
    behind = scene.add(square(20.0, "green", "behind"))  # behind the camera

    baked = scene.bake(cam)
    assert len(baked.tris) == 4  # behind-camera squares clipped
    assert baked.fc[:2] == ["blue", "blue"]   # far drawn first
    assert baked.fc[2:] == ["red", "red"]


def test_backface_culling_and_shading():
    """A sphere seen from +x: roughly half the faces survive culling, and
    lit faces are brighter than unlit ones."""
    scene = s3.Scene3D()
    cam = scene.add(s3.Camera3D(name="cam", fovy=40.0, znear=0.5,
                                zfar=50.0))
    cam.look_at([8.0, 0.0, 0.0], [0.0, 0.0, 0.0])
    scene.add(s3.Light3D(az=0.0, el=45.0))
    sph = scene.add(s3.sphere(1.0, az=16, el=8, face_color="gray"))

    baked = scene.bake(cam)
    n_total = sph.F.shape[0]
    assert 0.3 * n_total < len(baked.tris) < 0.75 * n_total
    # shading produced RGB tuples with varying brightness
    vals = [c for c in baked.fc if isinstance(c, tuple)]
    assert vals, "no shaded faces"
    bright = [sum(c) for c in vals]
    assert max(bright) > min(bright) + 0.2


def test_obj_loader_roundtrip(tmp_path):
    path = os.path.join(tmp_path, "tri.obj")
    with open(path, "w") as f:
        f.write("# comment\n")
        f.write("v 0 0 0\nv 1 0 0\nv 0 1 0\n")
        f.write("vn 0 0 1\n")
        f.write("f 1//1 2//1 3//1\n")
    mesh = s3.Mesh3D.from_obj(path, name="tri")
    np.testing.assert_allclose(mesh.V,
                               [[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    np.testing.assert_allclose(mesh.N, [[0, 0, 1]])
    np.testing.assert_allclose(mesh.F, [[0, 1, 2, 0]])


def test_render_smoke(tmp_path):
    """End-to-end render to a PNG (Agg): a lit sphere over a trajectory
    polyline with a visible body axis — the starship/freeflyer plot-suite
    pattern."""
    scene = s3.Scene3D()
    cam = scene.add(s3.Camera3D(name="cam", fovy=50.0, znear=0.2,
                                zfar=100.0))
    cam.look_at([6.0, 6.0, 4.0], [0.0, 0.0, 0.0])
    scene.add(s3.Light3D(az=300.0, el=60.0))
    body = scene.add(s3.Axis3D(name="body", visible=True, axis_length=1.5))
    body.set_pose(s3.homtransf(t=[0.0, 0.0, 1.0]))
    scene.add(s3.sphere(0.8, face_color="lightsteelblue"), parent=body)
    traj = np.stack([np.linspace(-3, 3, 30),
                     np.sin(np.linspace(0, 3, 30)),
                     np.linspace(0, 2, 30)], axis=1)
    scene.add(s3.polyline(traj, edge_color="orange", edge_width=1.5))

    out = os.path.join(tmp_path, "scene.png")
    scene.render("cam", out)
    assert os.path.exists(out) and os.path.getsize(out) > 1000
