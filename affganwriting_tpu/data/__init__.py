from affganwriting_tpu.data.iam import (
    parse_groundtruth,
    writer_label_map,
    load_corpus,
)
from affganwriting_tpu.data.words import WordStyleDataset, edits1

__all__ = [
    "parse_groundtruth",
    "writer_label_map",
    "load_corpus",
    "WordStyleDataset",
    "edits1",
]
