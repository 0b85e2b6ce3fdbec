"""Host-side evaluation metrics (reference supervised_train.py:63-70)."""

from __future__ import annotations

import numpy as np
from sklearn import metrics as skmetrics


def calc_f1(y_true: np.ndarray, y_pred: np.ndarray, sigmoid: bool):
    """(micro_f1, macro_f1) with the reference's thresholding: sigmoid
    multilabel rounds at 0.5; softmax takes the argmax as one-hot."""
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    if not sigmoid:
        y_true = np.argmax(y_true, axis=1)
        y_pred = np.argmax(y_pred, axis=1)
    else:
        y_pred = (y_pred > 0.5).astype(np.int32)
        y_true = (y_true > 0.5).astype(np.int32)
    return (
        skmetrics.f1_score(y_true, y_pred, average="micro", zero_division=0),
        skmetrics.f1_score(y_true, y_pred, average="macro", zero_division=0),
    )
