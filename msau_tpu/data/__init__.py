from msau_tpu.data.charset import Charset
from msau_tpu.data.pages import Line, Page, load_funsd_page, load_label_json_page
from msau_tpu.data import bbox, cellgraph, corners, featgrid, rasterize, wordgrid

__all__ = [
    "Charset",
    "Line",
    "Page",
    "load_funsd_page",
    "load_label_json_page",
    "bbox",
    "cellgraph",
    "corners",
    "featgrid",
    "rasterize",
    "wordgrid",
]
