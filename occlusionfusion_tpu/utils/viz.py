"""Visualization / export utilities.

Replaces the reference's visualization layer
(``fusion_with_occlusion/vis/`` open3d/plotly/matplotlib/ipyvolume
backends, ``utils/viz_utils.py``, ``motion_complete_utils.py:148-298``)
with headless-friendly primitives: PLY/OBJ mesh + point-cloud export, the
optical-flow colorwheel, and matplotlib renders of graphs/meshes —
no open3d/plotly dependency (neither ships in this image).
"""

from __future__ import annotations

import os

import numpy as np


# ---------------------------------------------------------------------------
# geometry export


def save_ply(
    path: str,
    vertices: np.ndarray,
    faces: np.ndarray | None = None,
    colors: np.ndarray | None = None,
):
    """ASCII PLY export of a mesh or point cloud (colors 0..255)."""
    vertices = np.asarray(vertices, np.float32)
    n = vertices.shape[0]
    has_color = colors is not None
    lines = ["ply", "format ascii 1.0", f"element vertex {n}"]
    lines += ["property float x", "property float y", "property float z"]
    if has_color:
        lines += [
            "property uchar red", "property uchar green", "property uchar blue"
        ]
    if faces is not None:
        lines.append(f"element face {len(faces)}")
        lines.append("property list uchar int vertex_indices")
    lines.append("end_header")
    body = []
    if has_color:
        c = np.clip(np.asarray(colors), 0, 255).astype(np.int32)
        for v, col in zip(vertices, c):
            body.append(f"{v[0]} {v[1]} {v[2]} {col[0]} {col[1]} {col[2]}")
    else:
        for v in vertices:
            body.append(f"{v[0]} {v[1]} {v[2]}")
    if faces is not None:
        for f in np.asarray(faces, np.int64):
            body.append(f"3 {f[0]} {f[1]} {f[2]}")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        fh.write("\n".join(lines + body) + "\n")


def save_obj(path: str, vertices: np.ndarray, faces: np.ndarray):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as fh:
        for v in np.asarray(vertices):
            fh.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for f in np.asarray(faces, np.int64) + 1:
            fh.write(f"f {f[0]} {f[1]} {f[2]}\n")


def load_ply(path: str):
    """Minimal ASCII PLY reader (vertices + faces) for round-tripping."""
    with open(path) as fh:
        lines = fh.read().splitlines()
    n_v = n_f = 0
    header_end = 0
    for i, ln in enumerate(lines):
        if ln.startswith("element vertex"):
            n_v = int(ln.split()[-1])
        elif ln.startswith("element face"):
            n_f = int(ln.split()[-1])
        elif ln == "end_header":
            header_end = i + 1
            break
    verts = np.array(
        [[float(x) for x in ln.split()[:3]] for ln in lines[header_end : header_end + n_v]],
        np.float32,
    )
    faces = np.array(
        [
            [int(x) for x in ln.split()[1:4]]
            for ln in lines[header_end + n_v : header_end + n_v + n_f]
        ],
        np.int32,
    ) if n_f else None
    return verts, faces


# ---------------------------------------------------------------------------
# flow colorwheel (motion_complete_utils.py:148-239 / utils/flow_vis.py)


def _make_colorwheel() -> np.ndarray:
    """Baker et al. optical-flow colorwheel, [55, 3] uint8."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    wheel = np.zeros((RY + YG + GC + CB + BM + MR, 3))
    col = 0
    wheel[:RY, 0] = 255
    wheel[:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col : col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col : col + YG, 1] = 255
    col += YG
    wheel[col : col + GC, 1] = 255
    wheel[col : col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col : col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col : col + CB, 2] = 255
    col += CB
    wheel[col : col + BM, 2] = 255
    wheel[col : col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col : col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col : col + MR, 0] = 255
    return wheel


def flow_to_color(flow: np.ndarray, max_norm: float | None = None) -> np.ndarray:
    """[..., 2] flow -> [..., 3] uint8 colorwheel image."""
    wheel = _make_colorwheel()
    n_cols = wheel.shape[0]
    u, v = flow[..., 0], flow[..., 1]
    rad = np.sqrt(u * u + v * v)
    if max_norm is None:
        max_norm = max(rad.max(), 1e-6)
    u, v = u / max_norm, v / max_norm
    rad = np.minimum(rad / max_norm, 1.0)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (n_cols - 1)
    k0 = np.floor(fk).astype(np.int32)
    k1 = (k0 + 1) % n_cols
    f = (fk - k0)[..., None]
    col = wheel[k0] / 255 * (1 - f) + wheel[k1] / 255 * f
    col = 1 - rad[..., None] * (1 - col)
    return (col * 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# matplotlib renders (headless)


def plot_graph(path: str, nodes, edges, node_colors=None, title=""):
    """Render the deformation graph to an image file."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(111, projection="3d")
    nodes = np.asarray(nodes)
    for i, row in enumerate(np.asarray(edges)):
        for j in row:
            if j >= 0:
                seg = nodes[[i, j]]
                ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], "gray", lw=0.5)
    c = node_colors if node_colors is not None else "C0"
    ax.scatter(nodes[:, 0], nodes[:, 1], nodes[:, 2], c=c, s=12)
    ax.set_title(title)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120)
    plt.close(fig)


def plot_depth(path: str, depth: np.ndarray, title=""):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6, 5))
    im = ax.imshow(np.asarray(depth), cmap="turbo")
    fig.colorbar(im, ax=ax)
    ax.set_title(title)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=120)
    plt.close(fig)
