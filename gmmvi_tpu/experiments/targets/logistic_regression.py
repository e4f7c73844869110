"""Bayesian logistic regression posteriors (breast cancer / german credit).

(reference: src/gmmvi/experiments/target_distributions/logistic_regression.py)

Full-batch and minibatch variants.  The likelihood uses the numerically-stable
log-sigmoid form: for z = -X theta,
  label==1: log sigma(z);  label==0: log sigma(z) - z
(reference: logistic_regression.py:55-68).  The whole posterior is one matmul
on the MXU.

The minibatch variant keeps its shuffle state in host numpy (it is inherently
stateful data plumbing); it is marked not jit-safe, so GMMVI uses the
propose/update split around it — the analogue of the reference evaluating it
eagerly.  With ``use_own_batch_per_sample`` each parameter sample gets its own
minibatch (local reparameterization, logistic_regression.py:125-135),
vectorized here by gathering a [num_samples, batch, features] tensor.
"""
from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from gmmvi_tpu.experiments.targets import datasets as data_lib
from gmmvi_tpu.experiments.targets.lnpdf import LNPDF

_PREC = jax.lax.Precision.HIGHEST
LOG_2PI = math.log(2.0 * math.pi)


def _stable_loglik_terms(features, labels):
    """[N_data, N_params] per-datum log likelihoods given z = -X theta."""
    logsig = jax.nn.log_sigmoid(features)
    return jnp.where(labels[:, None] == 1, logsig, logsig - features)


class LogisticRegression(LNPDF):
    """Full-batch Bayesian logistic regression
    (reference: logistic_regression.py:11-68).  Dimensionality = number of
    features + 1 (bias column prepended); N(0, 10^2) prior."""

    def __init__(self, dataset_id: str):
        super().__init__(use_log_density_and_grad=True, safe_for_jit=True)
        if dataset_id == "breast_cancer":
            x, labels = data_lib.load_breast_cancer()
        elif dataset_id == "german_credit":
            x, labels = data_lib.load_german_credit()
        else:
            raise ValueError(f"unknown dataset_id {dataset_id}")
        x = x / np.std(x, 0)[None, :]
        x = np.hstack((np.ones((len(x), 1)), x))
        self.data = jnp.asarray(x, jnp.float32)
        self.labels = jnp.asarray(labels, jnp.float32)
        self.num_dimensions = x.shape[1]
        self.prior_std = 10.0
        self.prior_mean = 0.0

    def get_num_dimensions(self):
        return self.num_dimensions

    def log_likelihood(self, theta):
        z = -jnp.einsum("nf,pf->np", self.data, theta, precision=_PREC)
        return jnp.sum(_stable_loglik_terms(z, self.labels), axis=0)

    def log_prior(self, theta):
        return jnp.sum(
            -math.log(self.prior_std)
            - 0.5 * LOG_2PI
            - 0.5 * jnp.square((theta - self.prior_mean) / self.prior_std),
            axis=1,
        )

    def log_density(self, theta):
        theta = jnp.asarray(theta, jnp.float32)
        return self.log_likelihood(theta) + self.log_prior(theta)

    def log_density_and_grad(self, theta):
        """Analytic posterior gradient — two matmuls instead of per-sample
        reverse-mode AD (the reference uses a GradientTape):

            grad log p(theta) = X^T (sigma(z) - y) - (theta - mu)/std^2

        with z = -X theta (so d z / d theta = -X, and d log-lik / d z is
        1 - sigma(z) for y=1 and -sigma(z) for y=0)."""
        theta = jnp.asarray(theta, jnp.float32)
        z = -jnp.einsum("nf,pf->np", self.data, theta, precision=_PREC)
        ld = jnp.sum(_stable_loglik_terms(z, self.labels), axis=0) \
            + self.log_prior(theta)
        coeff = jax.nn.sigmoid(z) - self.labels[:, None]       # [N, P]
        grad = jnp.einsum("np,nf->pf", coeff, self.data, precision=_PREC) \
            - (theta - self.prior_mean) / self.prior_std ** 2
        return ld, grad


class LogisticRegression_minibatch(LogisticRegression):
    """Minibatch variant with per-iteration reshuffling and optional
    per-sample batches (reference: logistic_regression.py:70-162)."""

    def __init__(self, dataset_id: str, batchsize: int, size_test_set: int,
                 use_own_batch_per_sample: bool, seed: int = 0):
        super().__init__(dataset_id)
        self._safe_for_jit = False  # stateful host-side data shuffling
        # the full-batch analytic gradient does not apply to minibatches;
        # this variant sticks with per-sample autodiff of log_density
        self._use_log_density_and_grad = False
        self._np_data = np.asarray(self.data)
        self._np_labels = np.asarray(self.labels)
        if size_test_set > 0:
            self.data_test = jnp.asarray(self._np_data[-size_test_set:])
            self.labels_test = jnp.asarray(self._np_labels[-size_test_set:])
            self._np_data = self._np_data[:-size_test_set]
            self._np_labels = self._np_labels[:-size_test_set]
        self.num_data = len(self._np_data)
        self.batchsize = int(batchsize)
        self.use_own_batch_per_sample = bool(use_own_batch_per_sample)
        self._rng = np.random.RandomState(seed)

    def _shuffle(self):
        perm = self._rng.permutation(self.num_data)
        self._np_data = self._np_data[perm]
        self._np_labels = self._np_labels[perm]

    def log_density_fb(self, theta):
        """Full-batch log density over the training split (evaluation;
        reference: logistic_regression.py:116-121)."""
        theta = jnp.asarray(theta, jnp.float32)
        data = jnp.asarray(self._np_data)
        labels = jnp.asarray(self._np_labels)
        z = -jnp.einsum("nf,pf->np", data, theta, precision=_PREC)
        ll = jnp.sum(_stable_loglik_terms(z, labels), axis=0)
        return ll + self.log_prior(theta)

    def log_density(self, theta):
        theta = jnp.asarray(theta, jnp.float32)
        self._shuffle()
        p = theta.shape[0]
        b = self.batchsize
        if self.use_own_batch_per_sample:
            # consecutive wrap-around batches, one per parameter sample
            # (reference: logistic_regression.py:126-135)
            starts = np.zeros(p, dtype=np.int64)
            s = 0
            for i in range(p):
                if s + b > self.num_data:
                    s = 0
                starts[i] = s
                s += b
            idx = (starts[:, None] + np.arange(b)[None, :])
            data = jnp.asarray(self._np_data[idx])        # [P, B, F]
            labels = jnp.asarray(self._np_labels[idx])    # [P, B]
            z = -jnp.einsum("pbf,pf->pb", data, theta, precision=_PREC)
            logsig = jax.nn.log_sigmoid(z)
            ll = jnp.mean(
                jnp.where(labels == 1, logsig, logsig - z), axis=1
            )
        else:
            data = jnp.asarray(self._np_data[:b])
            labels = jnp.asarray(self._np_labels[:b])
            z = -jnp.einsum("nf,pf->np", data, theta, precision=_PREC)
            ll = jnp.mean(_stable_loglik_terms(z, labels), axis=0)
        return self.num_data * ll + self.log_prior(theta)

    def expensive_metrics(self, model_state, samples) -> dict:
        """Full-batch ELBO (reference: logistic_regression.py:144-162)."""
        from gmmvi_tpu.models import gmm as gmm_ops

        entropy = -jnp.mean(gmm_ops.log_density(model_state, samples))
        mean_reward = jnp.mean(self.log_density_fb(samples))
        return {"elbo_fb": float(mean_reward + entropy)}


def make_breast_cancer():
    return LogisticRegression("breast_cancer")


def make_german_credit():
    return LogisticRegression("german_credit")


def make_breast_cancer_mb(batch_size, size_test_set, use_own_batch_per_sample):
    return LogisticRegression_minibatch(
        "breast_cancer", batch_size, size_test_set, use_own_batch_per_sample
    )


def make_german_credit_mb(batch_size, size_test_set, use_own_batch_per_sample):
    return LogisticRegression_minibatch(
        "german_credit", batch_size, size_test_set, use_own_batch_per_sample
    )
