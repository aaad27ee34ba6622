from .tfrecord import (
    TFRecordWriter,
    read_records,
    parse_example_uint8,
    parse_example_float,
    make_uint8_example,
    make_float_example,
    tfrecord_batches,
    list_shards,
)
from .npy import load_npy_clip, parse_label_from_filename, save_npy_clip
