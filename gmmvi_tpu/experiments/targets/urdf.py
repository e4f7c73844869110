"""Minimal URDF parsing + batched JAX forward kinematics.

Built for the Talos IK target (reference:
src/gmmvi/experiments/target_distributions/talos_ik.py:53-68, which delegates
to an external ``tf_robot_learning`` fork).  Here the kinematics is
implemented from scratch, TPU-first: the URDF is parsed **offline** into
static numpy arrays (per-segment fixed transforms, joint axes as precomputed
skew matrices, actuated-joint indices, link masses / CoM offsets), and the
forward pass is a fully jittable, batched, autodiff-able chain of ``[B, 3, 3]``
matmuls — so the whole IK target can live *inside* the compiled training step
(the reference must run its target eagerly, ``safe_for_tf_graph=False``).

Supports the URDF subset the Talos model uses: ``revolute`` (also treated as
``continuous``) and ``fixed`` joints, ``<origin xyz rpy>``, ``<axis>``,
``<limit lower upper>``, and ``<inertial><origin xyz/><mass/></inertial>``.
"""
from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Dict, List, NamedTuple, Sequence, Tuple

import numpy as np
import jax.numpy as jnp


def _floats(s: str | None, default=(0.0, 0.0, 0.0)) -> np.ndarray:
    if s is None:
        return np.asarray(default, np.float64)
    return np.asarray([float(v) for v in s.split()], np.float64)


def rpy_matrix(rpy: np.ndarray) -> np.ndarray:
    """URDF fixed-axis roll-pitch-yaw: R = Rz(y) @ Ry(p) @ Rx(r)."""
    r, p, y = rpy
    cr, sr = np.cos(r), np.sin(r)
    cp, sp = np.cos(p), np.sin(p)
    cy, sy = np.cos(y), np.sin(y)
    rx = np.array([[1, 0, 0], [0, cr, -sr], [0, sr, cr]])
    ry = np.array([[cp, 0, sp], [0, 1, 0], [-sp, 0, cp]])
    rz = np.array([[cy, -sy, 0], [sy, cy, 0], [0, 0, 1]])
    return rz @ ry @ rx


class Segment(NamedTuple):
    """One edge of the kinematic tree (joint + child link)."""

    joint_name: str
    child_link: str
    parent_idx: int          # node index of the parent link
    origin_rot: np.ndarray   # [3, 3] fixed rotation (joint <origin rpy>)
    origin_pos: np.ndarray   # [3]    fixed translation (joint <origin xyz>)
    axis: np.ndarray         # [3]    rotation axis (unit), zeros if fixed
    q_index: int             # index into the actuated-joint vector, -1 = fixed
    mass: float              # child-link mass (0 when no inertial)
    com: np.ndarray          # [3] child-link CoM offset in the link frame


class KinematicTree:
    """A rooted tree of :class:`Segment` s covering the paths to named tips.

    Parsed once on the host; :meth:`fk` runs batched forward kinematics in
    JAX (jit/grad-safe; the per-segment loop unrolls at trace time into ~36
    small batched matmuls, which XLA fuses).
    """

    def __init__(self, urdf_path: str, root: str, tips: Dict[str, str]):
        tree = ET.parse(urdf_path)
        xml_root = tree.getroot()

        joints = {}
        child_to_joint = {}
        for j in xml_root.findall("joint"):
            name = j.get("name")
            parent = j.find("parent").get("link")
            child = j.find("child").get("link")
            origin = j.find("origin")
            limit = j.find("limit")
            joints[name] = {
                "type": j.get("type"),
                "parent": parent,
                "child": child,
                "xyz": _floats(origin.get("xyz") if origin is not None else None),
                "rpy": _floats(origin.get("rpy") if origin is not None else None),
                "axis": _floats(
                    j.find("axis").get("xyz") if j.find("axis") is not None
                    else None, (1.0, 0.0, 0.0)
                ),
                "limits": (
                    (float(limit.get("lower", "0")), float(limit.get("upper", "0")))
                    if limit is not None else (0.0, 0.0)
                ),
            }
            child_to_joint[child] = name

        link_inertia = {}
        for l in xml_root.findall("link"):
            inertial = l.find("inertial")
            if inertial is None:
                link_inertia[l.get("name")] = (0.0, np.zeros(3))
            else:
                mass = float(inertial.find("mass").get("value"))
                io = inertial.find("origin")
                com = _floats(io.get("xyz") if io is not None else None)
                link_inertia[l.get("name")] = (mass, com)

        # root-to-tip joint paths (reference: tk.kdl_chain_from_urdf_model per
        # tip, talos_ik.py:63-66)
        paths: Dict[str, List[str]] = {}
        for tip_name, tip_link in tips.items():
            path = []
            cur = tip_link
            while cur != root:
                jn = child_to_joint[cur]
                path.append(jn)
                cur = joints[jn]["parent"]
            paths[tip_name] = list(reversed(path))

        # union tree in chain order; actuated joints numbered on first visit
        # (mirrors ChainDict.actuated_joint_names concatenation order)
        self.root = root
        self.segments: List[Segment] = []
        self.node_index: Dict[str, int] = {root: 0}
        self.actuated_joint_names: List[str] = []
        self.joint_limits_list: List[Tuple[float, float]] = []
        seen_joints = set()
        for tip_name in tips:
            for jn in paths[tip_name]:
                if jn in seen_joints:
                    continue
                seen_joints.add(jn)
                info = joints[jn]
                kind = info["type"]
                if kind in ("revolute", "continuous"):
                    q_index = len(self.actuated_joint_names)
                    self.actuated_joint_names.append(jn)
                    self.joint_limits_list.append(info["limits"])
                    axis = info["axis"] / np.linalg.norm(info["axis"])
                elif kind == "fixed":
                    q_index = -1
                    axis = np.zeros(3)
                else:
                    raise ValueError(
                        f"unsupported joint type {kind!r} for {jn!r} "
                        "(only revolute/continuous/fixed)"
                    )
                mass, com = link_inertia.get(info["child"], (0.0, np.zeros(3)))
                self.segments.append(Segment(
                    joint_name=jn,
                    child_link=info["child"],
                    parent_idx=self.node_index[info["parent"]],
                    origin_rot=rpy_matrix(info["rpy"]),
                    origin_pos=info["xyz"],
                    axis=axis,
                    q_index=q_index,
                    mass=mass,
                    com=com,
                ))
                self.node_index[info["child"]] = len(self.segments)

        self.tip_nodes = {n: self.node_index[l] for n, l in tips.items()}
        self.nb_joint = len(self.actuated_joint_names)
        root_mass, root_com = link_inertia.get(root, (0.0, np.zeros(3)))
        self.root_mass = root_mass
        self.root_com = root_com
        self.joint_limits = np.asarray(self.joint_limits_list, np.float32)

        # device-resident constants for the jitted forward pass
        f32 = lambda a: jnp.asarray(np.asarray(a, np.float32))
        self._origin_rot = f32(np.stack([s.origin_rot for s in self.segments]))
        self._origin_pos = f32(np.stack([s.origin_pos for s in self.segments]))
        self._masses = f32([s.mass for s in self.segments])
        self._coms = f32(np.stack([s.com for s in self.segments]))
        # precomputed skew(axis) and skew(axis)^2 for Rodrigues' formula
        skews = []
        for s in self.segments:
            ax, ay, az = s.axis
            skews.append(np.array([[0, -az, ay], [az, 0, -ax], [-ay, ax, 0]]))
        self._skew = f32(np.stack(skews))
        self._skew2 = f32(np.stack([k @ k for k in skews]))
        self._root_com = f32(root_com)
        self._total_mass = float(root_mass + sum(s.mass for s in self.segments))

    @property
    def mean_pose(self) -> np.ndarray:
        """Midpoint of the joint limits per actuated joint (the neutral pose
        the reference reads off its chain, talos_ik.py:41)."""
        return self.joint_limits.mean(axis=1)

    # -- forward kinematics (pure JAX) --------------------------------------
    def fk(self, q: jnp.ndarray, base_pos: jnp.ndarray, base_rot: jnp.ndarray):
        """Batched forward kinematics.

        Args:
            q: ``[B, nb_joint]`` actuated joint angles.
            base_pos: ``[B, 3]`` floating-base position.
            base_rot: ``[B, 3, 3]`` floating-base rotation.

        Returns:
            ``(positions [B, S+1, 3], rotations [B, S+1, 3, 3])`` of every
            link frame in world coordinates, node 0 being the root.
        """
        b = q.shape[0]
        eye = jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), (b, 3, 3))
        pos = [base_pos]
        rot = [base_rot]
        for i, seg in enumerate(self.segments):
            p_par, r_par = pos[seg.parent_idx], rot[seg.parent_idx]
            p = p_par + jnp.einsum("bij,j->bi", r_par, self._origin_pos[i])
            r = jnp.einsum("bij,jk->bik", r_par, self._origin_rot[i])
            if seg.q_index >= 0:
                theta = q[:, seg.q_index]
                # Rodrigues: R = I + sin(t) K + (1 - cos(t)) K^2
                r_joint = (
                    eye
                    + jnp.sin(theta)[:, None, None] * self._skew[i]
                    + (1.0 - jnp.cos(theta))[:, None, None] * self._skew2[i]
                )
                r = jnp.einsum("bij,bjk->bik", r, r_joint)
            pos.append(p)
            rot.append(r)
        return jnp.stack(pos, axis=1), jnp.stack(rot, axis=1)

    def tip_pose(self, positions, rotations, name: str) -> jnp.ndarray:
        """``[B, 12]`` pose vector ``[x y z, R.flatten()]`` of a named tip
        (the frame layout the reference's pose targets use, talos_ik.py:36-37)."""
        i = self.tip_nodes[name]
        return jnp.concatenate(
            [positions[:, i], rotations[:, i].reshape(-1, 9)], axis=-1
        )

    def com(self, positions, rotations) -> jnp.ndarray:
        """``[B, 3]`` mass-weighted center of mass over the tree's links.

        Each link is counted once (links shared between chains — the torso —
        contribute once), including the root link.
        """
        # world CoM of each child link: p_link + R_link @ com_offset
        link_coms = positions[:, 1:] + jnp.einsum(
            "bsij,sj->bsi", rotations[:, 1:], self._coms
        )
        weighted = jnp.einsum("bsi,s->bi", link_coms, self._masses)
        root_com = positions[:, 0] + jnp.einsum(
            "bij,j->bi", rotations[:, 0], self._root_com
        )
        weighted = weighted + self.root_mass * root_com
        return weighted / self._total_mass


def rpy_matrix_batched(rpy: jnp.ndarray) -> jnp.ndarray:
    """JAX version of :func:`rpy_matrix` over a batch: ``[B, 3] -> [B, 3, 3]``
    (the reference converts the floating-base Euler angles the same way,
    ``tk.rotation.rpy``, talos_ik.py:196-199)."""
    r, p, y = rpy[:, 0], rpy[:, 1], rpy[:, 2]
    cr, sr = jnp.cos(r), jnp.sin(r)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cy, sy = jnp.cos(y), jnp.sin(y)
    row0 = jnp.stack([cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr], -1)
    row1 = jnp.stack([sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr], -1)
    row2 = jnp.stack([-sp, cp * sr, cp * cr], -1)
    return jnp.stack([row0, row1, row2], axis=-2)
