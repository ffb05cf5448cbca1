"""Hollywood2 13-class multi-label action classification with optional
gaze attention.

Rebuild of `Classifier` (`/root/reference/models/action_classification.py`):

  * gaze attention (`action_classification.py:210-240`): gazemap [49,49]
    -> flatten -> [2401, 49] projection -> broadcast over the 1024 C3D
    channels -> elementwise product with c3d reshaped [1024, 49]
  * SVM head (`:242-263`): zero-init linear [50176, 13], loss =
    0.5*||W||^2 + svmC(=50) * hinge, SGD lr 0.01
  * NN head (`:265-292`): fc 50176 -> 256 -> 256 -> 13 (glorot, no relu in
    the reference), sigmoid cross-entropy, Adam with exp-decay lr
    (0.002, decay 0.96 every 10 steps)
  * evaluation (`:526-579`): Hamming loss, zero-one subset accuracy,
    per-class + mean average precision — implemented in NumPy (no sklearn)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops import initializers as init
from ..ops.layers import linear
from ..train import schedules

NUM_CLASSES = 13
C3D_FLAT = 1024 * 49


@dataclasses.dataclass
class ActionHParams:
    """`create_standard_hparams` equivalent
    (`action_classification.py:50-71`)."""

    batch_size: int = 10
    num_classes: int = NUM_CLASSES
    max_iter: int = 2001
    learning_rate: float = 0.002
    use_gazemap: bool = False
    head: str = "NN"         # NN | SVM
    svm_c: float = 50.0
    # False replicates the reference hinge EXACTLY
    # (`action_classification.py:252-253` feeds the {0,1} multi-hot raw, so
    # absent classes contribute a constant 1 with zero gradient — the SVM
    # never learns to suppress them). True (default) is the signed-label
    # fix documented in PARITY.md.
    svm_signed_labels: bool = True
    n_hidden: int = 256
    seed: int = 0


def init_params(key: jax.Array, hp: ActionHParams) -> dict:
    ks = jax.random.split(key, 5)
    params = {}
    if hp.use_gazemap:
        # reference `basic_graphs.py:105-106` 'normal' init =
        # tf.truncated_normal(stddev=0.05) for the [2401,49] projection
        params["gaze_proj_W"] = init.truncated_normal(ks[0], (2401, 49),
                                                      stddev=0.05)
    if hp.head == "SVM":
        params["svm_W"] = init.zeros((C3D_FLAT, hp.num_classes))
        params["svm_b"] = init.zeros((hp.num_classes,))
    else:
        params["h1_w"] = init.xavier_uniform(ks[1], (C3D_FLAT, hp.n_hidden))
        params["h1_b"] = init.zeros((hp.n_hidden,))
        params["h2_w"] = init.xavier_uniform(ks[2], (hp.n_hidden, hp.n_hidden))
        params["h2_b"] = init.zeros((hp.n_hidden,))
        params["out_w"] = init.xavier_uniform(ks[3],
                                              (hp.n_hidden, hp.num_classes))
        params["out_b"] = init.zeros((hp.num_classes,))
    return params


def project(params: dict, c3d: jax.Array, gazemap: Optional[jax.Array],
            use_gazemap: bool, compute_dtype=None) -> jax.Array:
    """[B, 1024, 7, 7] (+ [B, 49, 49]) -> [B, 50176]
    (`action_classification.py:210-240`)."""
    b = c3d.shape[0]
    flat = c3d.reshape(b, 1024, 49)
    if use_gazemap:
        gaze = gazemap.reshape(b, -1)
        proj = linear(gaze, params["gaze_proj_W"],
                      compute_dtype=compute_dtype)          # [B, 49]
        flat = flat * proj[:, None, :]
    return flat.reshape(b, C3D_FLAT)


def logits_fn(params: dict, c3d: jax.Array, gazemap: Optional[jax.Array],
              hp: ActionHParams, compute_dtype=None) -> jax.Array:
    x = project(params, c3d, gazemap, hp.use_gazemap, compute_dtype)
    if hp.head == "SVM":
        return linear(x, params["svm_W"], params["svm_b"],
                      compute_dtype=compute_dtype)
    h1 = linear(x, params["h1_w"], params["h1_b"],
                compute_dtype=compute_dtype)
    h2 = linear(h1, params["h2_w"], params["h2_b"],
                compute_dtype=compute_dtype)
    return linear(h2, params["out_w"], params["out_b"],
                  compute_dtype=compute_dtype)


def loss_fn(params: dict, batch: dict, hp: ActionHParams,
            compute_dtype=None) -> jax.Array:
    gaze = batch.get("gaze_pred") if hp.use_gazemap else None
    logits = logits_fn(params, batch["c3d"], gaze, hp, compute_dtype)
    labels = batch["labels"]
    if hp.head == "SVM":
        # hinge needs SIGNED labels: with the records' {0,1} multi-hot
        # fed raw (as the reference does, action_classification.py:253),
        # absent classes contribute max(0, 1-0) = 1 with ZERO gradient
        # and the SVM never learns to suppress them — reference bug
        # fixed by default (like the LR-restore bug; see PARITY.md);
        # `svm_signed_labels=False` replicates the reference verbatim for
        # strict A/B comparison.
        y = 2.0 * labels - 1.0 if hp.svm_signed_labels else labels
        reg = 0.5 * jnp.sum(jnp.square(params["svm_W"]))
        hinge = jnp.sum(jnp.maximum(0.0, 1.0 - y * logits))
        return reg + hp.svm_c * hinge
    xent = optax.sigmoid_binary_cross_entropy(logits, labels)
    return jnp.mean(xent)


def predict_proba(params: dict, batch: dict, hp: ActionHParams) -> jax.Array:
    gaze = batch.get("gaze_pred") if hp.use_gazemap else None
    logits = logits_fn(params, batch["c3d"], gaze, hp)
    if hp.head == "SVM":
        return logits  # margins
    return jax.nn.sigmoid(logits)


def make_optimizer(hp: ActionHParams) -> optax.GradientTransformation:
    if hp.head == "SVM":
        return optax.sgd(0.01)
    sched = schedules.exponential_decay(hp.learning_rate, 0.96, 10,
                                        staircase=False)
    return optax.adam(sched)


def make_train_step(hp: ActionHParams,
                    tx: optax.GradientTransformation) -> Callable:
    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, hp)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


class ActionClassifier:
    """Functional counterpart to the reference `Classifier.run`
    (`action_classification.py:384-433`)."""

    def __init__(self, hp: Optional[ActionHParams] = None):
        self.hp = hp or ActionHParams()
        self.params = init_params(jax.random.PRNGKey(self.hp.seed), self.hp)
        self.tx = make_optimizer(self.hp)
        self.opt_state = self.tx.init(self.params)
        self._step = make_train_step(self.hp, self.tx)

    def fit(self, batches) -> list[float]:
        losses = []
        for i, batch in enumerate(batches):
            if i >= self.hp.max_iter:
                break
            jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                      if k in ("c3d", "gaze_pred", "labels")}
            self.params, self.opt_state, loss = self._step(
                self.params, self.opt_state, jbatch)
            losses.append(float(loss))
        return losses

    def predict(self, batch: dict) -> np.ndarray:
        jbatch = {k: jnp.asarray(v) for k, v in batch.items()
                  if k in ("c3d", "gaze_pred", "labels")}
        return np.asarray(predict_proba(self.params, jbatch, self.hp))

    def save(self, path: str) -> None:
        """Params-only checkpoint (the reference checkpoints the classifier
        graph with tf.train.Saver; here orbax params suffice)."""
        from ..train.checkpoint import save_params

        save_params(path, self.params)

    @classmethod
    def load(cls, path: str, hp: Optional[ActionHParams] = None
             ) -> "ActionClassifier":
        import jax as _jax

        from ..train.checkpoint import load_params

        clf = cls(hp)
        abstract = _jax.tree_util.tree_map(
            lambda x: _jax.ShapeDtypeStruct(np.shape(x), x.dtype),
            clf.params)
        clf.params = load_params(path, abstract)
        clf.opt_state = clf.tx.init(clf.params)
        return clf


# --------------------------------------------------------------- metrics

def hamming_loss(y_true: np.ndarray, y_pred: np.ndarray,
                 threshold: float = 0.5) -> float:
    y_pred = (np.asarray(y_pred) >= threshold).astype(np.float32)
    return float(np.mean(np.asarray(y_true) != y_pred))


def zero_one_loss(y_true: np.ndarray, y_pred: np.ndarray,
                  threshold: float = 0.5) -> float:
    y_pred = (np.asarray(y_pred) >= threshold).astype(np.float32)
    exact = np.all(np.asarray(y_true) == y_pred, axis=-1)
    return float(1.0 - exact.mean())


def average_precision(y_true: np.ndarray, y_score: np.ndarray) -> np.ndarray:
    """Per-class AP (area under precision-recall, step interpolation)."""
    y_true = np.asarray(y_true)
    y_score = np.asarray(y_score)
    aps = []
    for c in range(y_true.shape[1]):
        t, s = y_true[:, c], y_score[:, c]
        if t.sum() == 0:
            aps.append(np.nan)
            continue
        order = np.argsort(-s)
        t = t[order]
        tp = np.cumsum(t)
        precision = tp / np.arange(1, len(t) + 1)
        aps.append(float((precision * t).sum() / t.sum()))
    return np.asarray(aps)


def evaluate(y_true: np.ndarray, y_score: np.ndarray,
             threshold: float = 0.5) -> dict:
    """`threshold` is the positive-class decision boundary: 0.5 for the
    NN head's sigmoid probabilities, 0.0 for the SVM head's raw margins
    (the reference thresholds SVM output with np.sign)."""
    aps = average_precision(y_true, y_score)
    return {
        "hamming_loss": hamming_loss(y_true, y_score, threshold),
        "zero_one_loss": zero_one_loss(y_true, y_score, threshold),
        "mean_average_precision": float(np.nanmean(aps)),
        "per_class_ap": aps,
    }
