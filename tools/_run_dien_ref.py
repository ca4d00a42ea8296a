"""Shim runner for the reference DIEN.py under pandas 3.

The reference calls `tmp_df.fillna(0)` on columns pandas 3 infers as
str-dtype (arrow-backed), which raises TypeError — a pandas-version
incompatibility in the reference script, not a data issue (pandas 1.x
gave object dtype where integer fill is legal). This runner patches
`pandas.read_csv` to return object-dtype frames (the pandas-1 behaviour
the script was written against) and then executes the UNMODIFIED
reference script via runpy.

Used by tools/reference_anchor.py; not part of the framework.
"""

import os
import runpy
import sys

os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

import pandas as pd

_orig_read_csv = pd.read_csv


def _read_csv_object(*args, **kwargs):
    df = _orig_read_csv(*args, **kwargs)
    # pandas-1 compat: strings as object dtype so fillna(0) works
    for col in df.columns:
        if str(df[col].dtype) in ("str", "string"):
            df[col] = df[col].astype(object)
    return df


pd.read_csv = _read_csv_object

# pandas 3 removed DataFrame.applymap (renamed to .map in 2.1)
if not hasattr(pd.DataFrame, "applymap"):
    pd.DataFrame.applymap = pd.DataFrame.map

# Python 3.11 removed set support from random.sample (the script samples
# negatives from a set difference, DIEN.py:36); sorted() keeps the draw
# uniform over the same population.
import random

_orig_sample = random.sample


def _sample_compat(population, k, **kw):
    if isinstance(population, (set, frozenset)):
        population = sorted(population)
    return _orig_sample(population, k, **kw)


random.sample = _sample_compat

# tf_keras's evaluate returns extra per-output loss entries vs the
# author's Keras, breaking `loss, auc = model.evaluate(...)` (DIEN.py:318).
# Return exactly (total loss, the script's add_metric 'auc_value').
import tensorflow as tf

_orig_evaluate = tf.keras.Model.evaluate


def _evaluate_compat(self, *args, **kwargs):
    kwargs["return_dict"] = True
    d = _orig_evaluate(self, *args, **kwargs)
    if isinstance(d, dict) and "auc_value" in d:
        return d.get("loss", 0.0), d["auc_value"]
    return d


tf.keras.Model.evaluate = _evaluate_compat

runpy.run_path(sys.argv[1], run_name="__main__")
