"""Point-cloud figure helpers (plotly, gated).

Counterpart of reference `utils.view_cloud_plotly` (utils.py:61-113) and
`save_las` (utils.py:193-233). plotly/laspy are not baked into this image,
so every entry point degrades gracefully: figures fall back to a dict
payload that can be serialized, and cloud export falls back to .npz.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _plotly():
    try:
        import plotly.graph_objects as go
        return go
    except ImportError:
        return None


def view_cloud_plotly(points: np.ndarray, rgb: Optional[np.ndarray] = None, *,
                      colorscale: Optional[str] = None, show: bool = False,
                      point_size: float = 2.0, axes_visible: bool = False,
                      title: str = ""):
    """3D scatter of an (N, 3) cloud. rgb: (N, 3) in [0,1] or (N,) scalar
    values (used with a colorscale). Returns a plotly Figure, or a plain
    dict payload when plotly is unavailable."""
    points = np.asarray(points)
    go = _plotly()
    if rgb is not None:
        rgb = np.asarray(rgb)
        if rgb.ndim == 2 and rgb.shape[1] == 3:
            colors = [f"rgb({int(r*255)},{int(g*255)},{int(b*255)})"
                      for r, g, b in np.clip(rgb, 0, 1)]
            marker = dict(size=point_size, color=colors)
        else:
            marker = dict(size=point_size, color=rgb.reshape(-1),
                          colorscale=colorscale or "Viridis", showscale=True)
    else:
        marker = dict(size=point_size)
    if go is None:
        return {"type": "cloud_figure", "n_points": int(points.shape[0]),
                "title": title, "marker": {k: v for k, v in marker.items()
                                           if k == "size"}}
    fig = go.Figure(data=[go.Scatter3d(
        x=points[:, 0], y=points[:, 1], z=points[:, 2],
        mode="markers", marker=marker)])
    fig.update_layout(title=title, scene=dict(
        xaxis_visible=axes_visible, yaxis_visible=axes_visible,
        zaxis_visible=axes_visible, aspectmode="data"))
    if show:
        fig.show()
    return fig


def save_cloud(path: str, points: np.ndarray,
               rgb: Optional[np.ndarray] = None) -> str:
    """Export a cloud: .las/.laz via laspy if available, else .npz."""
    points = np.asarray(points)
    try:
        import laspy
        header = laspy.LasHeader(point_format=2)
        las = laspy.LasData(header)
        las.x, las.y, las.z = points[:, 0], points[:, 1], points[:, 2]
        if rgb is not None:
            rgb16 = np.clip(np.asarray(rgb) * 65535, 0, 65535).astype(np.uint16)
            las.red, las.green, las.blue = rgb16[:, 0], rgb16[:, 1], rgb16[:, 2]
        if not path.endswith((".las", ".laz")):
            path += ".las"
        las.write(path)
        return path
    except ImportError:
        if not path.endswith(".npz"):
            path += ".npz"
        np.savez(path, points=points,
                 **({"rgb": np.asarray(rgb)} if rgb is not None else {}))
        return path
