"""Bayesian neural network posterior targets (MNIST classifier, WINE regressor).

(reference: src/gmmvi/experiments/target_distributions/bnn.py)

The network is a plain-JAX MLP evaluated from a flat weight vector
(reference: bnn.py:151-166); the minibatch log-likelihood is scaled by the
training-set size; the prior is zero-mean Gaussian.  Gradients are supplied by
the target (``use_log_density_and_grad=True``, reference bnn.py:87) — here via
``jax.grad`` through the forward pass, vectorized over parameter samples with
``vmap`` (the reference loops over samples, bnn.py:185-198).

Minibatch plumbing is stateful host-side shuffling (the JAX analogue of the
reference's tf.data iterator), so the target is not jit-safe and GMMVI uses
the propose/update split around it.
"""
from __future__ import annotations

import math
from typing import Callable, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from gmmvi_tpu.experiments.targets import datasets as data_lib
from gmmvi_tpu.experiments.targets.lnpdf import LNPDF

LOG_2PI = math.log(2.0 * math.pi)


def _mlp_shapes(input_dim: int, hidden_units: Sequence[int], output_dim: int):
    shapes = []
    last = input_dim
    for width in hidden_units:
        shapes.append((last, width))
        shapes.append((width,))
        last = width
    shapes.append((last, output_dim))
    shapes.append((output_dim,))
    return shapes


def mlp_forward(x_flat_weights, inputs, shapes, activations):
    """Forward pass from a flat weight vector (reference: bnn.py:151-166)."""
    out = inputs
    start = 0
    layer = 0
    i = 0
    while i < len(shapes):
        w_shape, b_shape = shapes[i], shapes[i + 1]
        w_size = int(np.prod(w_shape))
        w = x_flat_weights[start:start + w_size].reshape(w_shape)
        start += w_size
        b = x_flat_weights[start:start + b_shape[0]]
        start += b_shape[0]
        out = activations[layer](out @ w + b)
        layer += 1
        i += 2
    return out


class BNN_LNPDF(LNPDF):
    """(reference: bnn.py:59-310)"""

    def __init__(self, likelihood_scaling, dataset_seed, prior_std, batch_size,
                 hidden_units, loss: str, activations):
        super().__init__(use_log_density_and_grad=True, safe_for_jit=False)
        self.likelihood_scaling = float(likelihood_scaling)
        self.dataset_seed = dataset_seed
        self.hidden_units = list(hidden_units)
        self.activations = activations
        self.batch_size = int(batch_size)
        self.loss_kind = loss  # "ce" | "mse"

        (x_tr, y_tr), (x_te, y_te), (x_va, y_va), in_dim, out_dim = (
            self.prepare_data()
        )
        self._x_tr, self._y_tr = x_tr, y_tr
        self._x_te, self._y_te = x_te, y_te
        self._x_va, self._y_va = x_va, y_va
        self.train_size = len(x_tr)
        self.input_dim, self.output_dim = in_dim, out_dim
        self.shapes = _mlp_shapes(in_dim, self.hidden_units, out_dim)
        self._num_dimensions = int(sum(np.prod(s) for s in self.shapes))
        self.prior_std = float(prior_std)
        self._rng = np.random.RandomState(abs(hash(("bnn", dataset_seed))) % (2**31))
        self._cursor = 0
        self._order = self._rng.permutation(self.train_size)
        self._grad_fn = None

    # -- data plumbing ------------------------------------------------------
    def prepare_data(self):
        raise NotImplementedError

    def _next_batches(self, n: int):
        """n consecutive shuffled minibatches (one per parameter sample)."""
        idx = np.empty((n, self.batch_size), np.int64)
        for i in range(n):
            if self._cursor + self.batch_size > self.train_size:
                self._order = self._rng.permutation(self.train_size)
                self._cursor = 0
            idx[i] = self._order[self._cursor:self._cursor + self.batch_size]
            self._cursor += self.batch_size
        return self._x_tr[idx], self._y_tr[idx]

    # -- model --------------------------------------------------------------
    def _batch_loss(self, params, features, labels):
        out = mlp_forward(params, features, self.shapes, self.activations)
        if self.loss_kind == "ce":
            logp = jax.nn.log_softmax(out, axis=-1)
            return -jnp.mean(logp[jnp.arange(out.shape[0]), labels])
        return jnp.mean(jnp.square(out[:, 0] - labels))

    def get_num_dimensions(self):
        return self._num_dimensions

    def _log_prior(self, x):
        return -0.5 * jnp.sum(jnp.square(x / self.prior_std), axis=-1)

    def _posterior_one(self, params, features, labels):
        ll = -self.train_size * self._batch_loss(params, features, labels)
        return self.likelihood_scaling * (ll + self._log_prior(params[None])[0])

    def log_density_and_grad(self, x):
        x = jnp.asarray(x, jnp.float32)
        feats, labels = self._next_batches(x.shape[0])
        if self._grad_fn is None:
            self._grad_fn = jax.jit(
                jax.vmap(jax.value_and_grad(self._posterior_one))
            )
        return self._grad_fn(x, jnp.asarray(feats), jnp.asarray(labels))

    def log_density(self, x):
        return self.log_density_and_grad(x)[0]

    # -- evaluation ---------------------------------------------------------
    def _bayesian_ensemble_loss(self, x, features, labels):
        """Average the network outputs over parameter samples, then evaluate
        loss + metric (reference: bnn.py:289-310)."""
        x = jnp.asarray(x, jnp.float32)

        def fwd(params):
            return mlp_forward(params, features, self.shapes, self.activations)

        out = jnp.mean(jax.lax.map(fwd, x), axis=0)
        if self.loss_kind == "ce":
            logp = jax.nn.log_softmax(out, axis=-1)
            loss = -jnp.mean(logp[jnp.arange(out.shape[0]), labels])
            metric = jnp.mean(jnp.argmax(out, axis=-1) == labels)
        else:
            loss = jnp.mean(jnp.square(out[:, 0] - labels))
            metric = jnp.sqrt(loss)
        return float(loss), float(metric)

    def expensive_metrics(self, model_state, samples) -> dict:
        n_eval = min(64, samples.shape[0])
        te_loss, te_metric = self._bayesian_ensemble_loss(
            samples[:n_eval], jnp.asarray(self._x_te), jnp.asarray(self._y_te)
        )
        va_loss, va_metric = self._bayesian_ensemble_loss(
            samples[:n_eval], jnp.asarray(self._x_va), jnp.asarray(self._y_va)
        )
        return {
            "bi_test_loss": te_loss,
            "bi_test_accuracy": te_metric,
            "bi_vali_loss": va_loss,
            "bi_vali_accuracy": va_metric,
        }


class BNN_MNIST(BNN_LNPDF):
    """784-128-10 ReLU classifier, cross-entropy loss
    (reference: bnn.py:312-380)."""

    def __init__(self, likelihood_scaling, prior_std, batch_size):
        super().__init__(
            likelihood_scaling=likelihood_scaling, prior_std=prior_std,
            batch_size=batch_size, dataset_seed=-1, hidden_units=[128],
            loss="ce", activations=[jax.nn.relu, lambda x: x],
        )

    def prepare_data(self):
        x_tr, y_tr, x_te, y_te = data_lib.load_mnist()
        x_tr = x_tr.reshape(len(x_tr), -1).astype(np.float32)
        x_te = x_te.reshape(len(x_te), -1).astype(np.float32)
        n_test = len(x_te) // 2
        return (
            (x_tr, y_tr.astype(np.int32)),
            (x_te[:n_test], y_te[:n_test].astype(np.int32)),
            (x_te[n_test:], y_te[n_test:].astype(np.int32)),
            784, 10,
        )


class BNN_WINE(BNN_LNPDF):
    """11-8-8-1 sigmoid regressor, MSE loss (reference: bnn.py:385-444)."""

    def __init__(self, dataset_seed, likelihood_scaling, prior_std, batch_size):
        super().__init__(
            likelihood_scaling=likelihood_scaling, prior_std=prior_std,
            batch_size=batch_size, dataset_seed=dataset_seed,
            hidden_units=[8, 8], loss="mse",
            activations=[jax.nn.sigmoid, jax.nn.sigmoid, lambda x: x],
        )

    def prepare_data(self):
        d = data_lib.load_wine_split(self.dataset_seed)
        return (
            (d["features_train"].astype(np.float32),
             d["labels_train"].astype(np.float32)),
            (d["features_test"].astype(np.float32),
             d["labels_test"].astype(np.float32)),
            (d["features_vali"].astype(np.float32),
             d["labels_vali"].astype(np.float32)),
            11, 1,
        )

    def expensive_metrics(self, model_state, samples) -> dict:
        m = super().expensive_metrics(model_state, samples)
        m["bi_vali_rmse"] = m.pop("bi_vali_accuracy")
        return m


def make_MNIST_target(likelihood_scaling, prior_std, batch_size):
    return BNN_MNIST(likelihood_scaling, prior_std, batch_size)


def make_WINE_target(likelihood_scaling, dataset_seed, prior_std, batch_size):
    return BNN_WINE(dataset_seed, likelihood_scaling, prior_std, batch_size)
