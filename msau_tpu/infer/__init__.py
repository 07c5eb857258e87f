from msau_tpu.infer.schema import DEFAULT_CLASS_NAMES, FieldSchema, post_process_kv
from msau_tpu.infer.reading_order import sort_box_reading_order
from msau_tpu.infer.kv_model import KVModel

__all__ = [
    "DEFAULT_CLASS_NAMES",
    "FieldSchema",
    "post_process_kv",
    "sort_box_reading_order",
    "KVModel",
]
