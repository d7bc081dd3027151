"""dup_ocropy_ray — a Ray-Data-native document-analysis engine.

A brand-new engine with the query/data-processing capabilities of ocropy
(ocropus-archive/DUP-ocropy): nlbin-style adaptive binarization,
gpageseg-style column/line segmentation with reading order, and a
bidirectional-LSTM + CTC line recognizer — re-expressed as streaming
``ray.data.Dataset`` stages over zero-copy Arrow batches, plus the
large-scale training-data operators (dedup, similarity search, text
analysis) that a 100 TB pipeline needs.

Layout:
  functions/  pure numpy/python kernels (png codec, image ops, slice
              algebra, morphology, text normalization, edit distance,
              hashing) used inside ``map_batches`` UDFs
  nn/         bidi-LSTM + CTC (forward, decode, training), codec
  stages/     Ray Data stage UDFs (decode, binarize, segment, recognize,
              reassemble, eval)
  sources/    fixture/corpus synthesis + media store + readers
  pipelines/  end-to-end pipeline compositions + query registry
  state/      checkpoint / lineage / resume

IMPORTANT: nothing in this package calls ``ray.init``/``ray.shutdown`` —
the session is owned by the caller (driver, bench.py, or test fixture).
"""

__version__ = "0.2.0"

# Quiet Ray's per-task "Failed to hash the schemas (for deduplication)"
# warning: pyarrow Schemas with metadata are unhashable, and Ray's
# pandas-block -> Arrow conversion attaches pandas metadata at shuffle
# boundaries.  Reads are fixed at the source (tuning.parquet_schema); this
# covers blocks produced by pandas-format UDFs.  Runs in every worker that
# unpickles one of our UDFs (module import precedes task execution).
import logging as _logging

_logging.getLogger(
    "ray.data._internal.arrow_ops.transform_pyarrow"
).setLevel(_logging.ERROR)
