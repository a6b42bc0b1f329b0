"""
JAX softmax classifier trained with mini-batch SGD (optax).

The TPU-native counterpart of the reference's SGDClassifier option
(reference: nimrud/prototypes/apc.py:1481-1485): a linear decision
function trained on device.  Unlike the hinge-loss reference it optimizes
cross-entropy so ``predict_proba`` is well-defined (the reference's
workflows fall back to decision_function for SVMs).

The pure functions ``init_params`` / ``train_step`` / ``predict_logits``
are exported for the multi-chip data-parallel training path in
nimrud_tpu.parallel.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax


def init_params(rng_key, n_features, n_classes, dtype=jnp.float32):
    w_key, _ = jax.random.split(rng_key)
    scale = 1.0 / np.sqrt(n_features)
    return {
        "w": jax.random.normal(
            w_key, (n_features, n_classes), dtype=dtype) * scale,
        "b": jnp.zeros((n_classes,), dtype=dtype),
    }


def predict_logits(params, data):
    return jnp.dot(data, params["w"],
                   preferred_element_type=jnp.float32) + params["b"]


def loss_fn(params, data, labels, weight_decay=0.0):
    logits = predict_logits(params, data)
    log_probs = jax.nn.log_softmax(logits)
    nll = -jnp.take_along_axis(
        log_probs, labels[:, None], axis=1).mean()
    if weight_decay:
        nll = nll + weight_decay * jnp.sum(params["w"] ** 2)
    return nll


@functools.partial(jax.jit, static_argnames=("optimizer", "weight_decay"))
def train_step(params, opt_state, data, labels, optimizer, weight_decay):
    loss, grads = jax.value_and_grad(loss_fn)(
        params, data, labels, weight_decay)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


class SoftmaxClassifier:
    """sklearn-style fit/predict/predict_proba linear softmax model."""

    def __init__(self, learning_rate=0.05, epochs=40, batch_size=1024,
                 weight_decay=1e-5, seed=0, standardize=True):
        self.learning_rate = learning_rate
        self.epochs = epochs
        self.batch_size = batch_size
        self.weight_decay = weight_decay
        self.seed = seed
        self.standardize = standardize
        self.params = None

    def _transform(self, data):
        data = np.asarray(data, dtype=np.float32)
        if self.standardize:
            data = (data - self.mean_) / self.scale_
        return data

    def fit(self, data, labels):
        data = np.asarray(data, dtype=np.float32)
        labels = np.asarray(labels).astype(np.int32)
        self.n_classes_ = int(labels.max() + 1)
        self.mean_ = data.mean(0) if self.standardize \
            else np.zeros(data.shape[1], np.float32)
        self.scale_ = (data.std(0) + 1e-6) if self.standardize \
            else np.ones(data.shape[1], np.float32)
        data = self._transform(data)

        key = jax.random.PRNGKey(self.seed)
        params = init_params(key, data.shape[1], self.n_classes_)
        optimizer = optax.adam(self.learning_rate)
        opt_state = optimizer.init(params)

        rng = np.random.RandomState(self.seed)
        n = data.shape[0]
        batch = min(self.batch_size, n)
        for _ in range(self.epochs):
            order = rng.permutation(n)
            for start in range(0, n - batch + 1, batch):
                rows = order[start:start + batch]
                params, opt_state, _ = train_step(
                    params, opt_state,
                    jnp.asarray(data[rows]), jnp.asarray(labels[rows]),
                    optimizer, self.weight_decay)
        self.params = jax.tree.map(np.asarray, params)
        return self

    def fit_device(self, features, labels, steps=None, n_classes=None):
        """
        Fit from device-resident features without any device->host
        transfer: standardization, batching and optimization all run on
        device, and the parameters stay there (NumPy views materialize
        lazily if read).  Pass ``n_classes`` to avoid even the scalar
        transfer of labels.max().
        """
        features = jnp.asarray(features, dtype=jnp.float32)
        labels = jnp.asarray(labels, dtype=jnp.int32)
        n, width = features.shape
        self.n_classes_ = int(labels.max() + 1) if n_classes is None \
            else int(n_classes)
        if self.standardize:
            self.mean_ = features.mean(0)
            self.scale_ = features.std(0) + 1e-6
        else:
            self.mean_ = jnp.zeros(width, jnp.float32)
            self.scale_ = jnp.ones(width, jnp.float32)
        data = (features - self.mean_) / self.scale_

        batch = min(self.batch_size, n)
        if steps is None:
            steps = max(1, self.epochs * (n // batch))
        optimizer = optax.adam(self.learning_rate)
        params = init_params(
            jax.random.PRNGKey(self.seed), width, self.n_classes_)
        opt_state = optimizer.init(params)

        @jax.jit
        def run(params, opt_state, data, labels, key):
            def step(carry, key):
                params, opt_state = carry
                rows = jax.random.randint(key, (batch,), 0, n)
                loss, grads = jax.value_and_grad(loss_fn)(
                    params, data[rows], labels[rows], self.weight_decay)
                updates, opt_state = optimizer.update(
                    grads, opt_state, params)
                return (optax.apply_updates(params, updates),
                        opt_state), loss
            keys = jax.random.split(key, steps)
            (params, opt_state), losses = jax.lax.scan(
                step, (params, opt_state), keys)
            return params, losses[-1]

        params, _ = run(params, opt_state, data, labels,
                        jax.random.PRNGKey(self.seed + 1))
        self.params = params
        return self

    def proba_device(self, features):
        """Class probabilities for a device-resident feature array."""
        mean = jnp.asarray(self.mean_)
        scale = jnp.asarray(self.scale_)
        params = jax.tree.map(jnp.asarray, self.params)
        return jax.nn.softmax(
            predict_logits(params, (features - mean) / scale))

    def predict_proba(self, data):
        data = jnp.asarray(self._transform(data))
        params = jax.tree.map(jnp.asarray, self.params)
        return np.asarray(jax.nn.softmax(predict_logits(params, data)))

    def predict(self, data):
        return self.predict_proba(data).argmax(axis=1)
