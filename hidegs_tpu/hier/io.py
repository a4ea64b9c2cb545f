"""`.hier` binary hierarchy format IO.

Byte-compatible with the reference writer/loader
(gaussianhierarchy/hierarchy_loader.cpp:16-60, hierarchy_writer.cpp:14-118,
types.h:50-66):

    int32 P
    float pos[P*3]; float rot[P*4]; float scale[P*3]; float alpha[P];
    float shs[P*48]
    int32 N
    Node[N]: int32 {depth, parent, start, count_leafs, count_merged,
                    start_children, count_children}
    Box[N]:  float {min.xyzw, max.xyzw}   (min.w carries the node granularity)

A negative P in the header marks the half-precision compressed variant
(HalfNode, types.h:61-66) — read is supported, write always emits float.

Gaussian attribute conventions (writer.cpp:36-55): `scale` is the LOG scale
(the creator writes g.scale.array().log()); `alpha` is the ACTIVATED opacity
in [0,1] (the reference's create_from_hier switches the opacity activation to
|x|, scene/gaussian_model.py:358-431); shs are [dc(3), rest(45)] per point.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

NODE_FIELDS = 7


class Hierarchy(NamedTuple):
    pos: np.ndarray  # (P, 3) f32
    rot: np.ndarray  # (P, 4) f32
    scale: np.ndarray  # (P, 3) f32 LOG scale
    alpha: np.ndarray  # (P,) f32 activated opacity
    shs: np.ndarray  # (P, 16, 3) f32
    nodes: np.ndarray  # (N, 7) i32 [depth,parent,start,count_leafs,count_merged,start_children,count_children]
    boxes: np.ndarray  # (N, 2, 4) f32 [min.xyzw, max.xyzw]

    @property
    def num_points(self) -> int:
        return len(self.pos)

    @property
    def num_nodes(self) -> int:
        return len(self.nodes)


def write_hier(path: str, h: Hierarchy) -> None:
    P = len(h.pos)
    N = len(h.nodes)
    with open(path, "wb") as f:
        np.int32(P).tofile(f)
        h.pos.astype("<f4").tofile(f)
        h.rot.astype("<f4").tofile(f)
        h.scale.astype("<f4").tofile(f)
        h.alpha.astype("<f4").tofile(f)
        # shs stored as dc(3) + rest(45) flat per point
        h.shs.reshape(P, 48).astype("<f4").tofile(f)
        np.int32(N).tofile(f)
        h.nodes.astype("<i4").tofile(f)
        h.boxes.reshape(N, 8).astype("<f4").tofile(f)


def read_hier(path: str) -> Hierarchy:
    with open(path, "rb") as f:
        P = int(np.fromfile(f, "<i4", 1)[0])
        if P < 0:
            raise NotImplementedError(
                "compressed half-precision .hier not supported yet (types.h:61-66)"
            )
        pos = np.fromfile(f, "<f4", P * 3).reshape(P, 3)
        rot = np.fromfile(f, "<f4", P * 4).reshape(P, 4)
        scale = np.fromfile(f, "<f4", P * 3).reshape(P, 3)
        alpha = np.fromfile(f, "<f4", P)
        shs = np.fromfile(f, "<f4", P * 48).reshape(P, 16, 3)
        N = int(np.fromfile(f, "<i4", 1)[0])
        nodes = np.fromfile(f, "<i4", N * NODE_FIELDS).reshape(N, NODE_FIELDS)
        boxes = np.fromfile(f, "<f4", N * 8).reshape(N, 2, 4)
    return Hierarchy(pos, rot, scale, alpha, shs, nodes, boxes)


# node field indices
DEPTH, PARENT, START, COUNT_LEAFS, COUNT_MERGED, START_CHILDREN, COUNT_CHILDREN = range(7)
