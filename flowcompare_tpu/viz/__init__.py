from .attention import capture_attention, render_attention
from .change_map import DatasetViewer, visualize_change
from .cloud import save_cloud, view_cloud_plotly

__all__ = [
    "capture_attention", "render_attention",
    "DatasetViewer", "visualize_change",
    "save_cloud", "view_cloud_plotly",
]
