"""
The flagship end-to-end model: multiscale geometric feature extraction
fused with per-point classification, device-resident.

A :class:`GeometryClassifier` is the framework's equivalent of the
reference's full workflow (feature MSO chain + trained classifier +
per-point class probabilities, reference: nimrud/prototypes/apc.py
gmso_APC + multiclass_self + apply_clf_APC) as one object: ``fit`` on a
labeled cloud, ``predict``/``predict_proba`` on new clouds.  Features
never leave the device between extraction and classification -- only the
(small) probabilities or labels come back to the host.
"""

import numpy as np
import jax
import jax.numpy as jnp

from nimrud_tpu.features.multiscale import (
    extract_scaleset, extract_scaleset_device)
from nimrud_tpu.learning.classifiers import param_classifier


class GeometryClassifier:
    """
    Args:
      scaleset:   sequence of (voxel_edge, radii) bands
                  (see features.multiscale.extract_scaleset).
      kind:       feature layout (minimal / geometric / oriented /
                  covariance).
      classifier: a classifier kind name for
                  :func:`nimrud_tpu.learning.classifiers.param_classifier`
                  or an already-constructed classifier object.
      classifier_kwargs: forwarded to param_classifier when ``classifier``
                  is a name.
      exclude_radius / method / chunk_size: forwarded to the extractor.
    """

    def __init__(self, scaleset, kind="minimal", classifier="linear",
                 classifier_kwargs=None, exclude_radius=None,
                 method="auto", chunk_size=1024):
        self.scaleset = [(float(e), tuple(float(r) for r in rs))
                         for e, rs in scaleset]
        self.kind = kind
        self.exclude_radius = exclude_radius
        self.method = method
        self.chunk_size = chunk_size
        if isinstance(classifier, str):
            self.classifier = param_classifier(
                classifier, **(classifier_kwargs or {}))
        else:
            self.classifier = classifier

    # -- features -------------------------------------------------------------

    def extract_device(self, cloud, search=None):
        """Multiscale features for every point, left on device."""
        if search is None:
            search = cloud
        return extract_scaleset_device(
            cloud, search, self.scaleset, self.kind,
            exclude_radius=self.exclude_radius, method=self.method,
            chunk_size=self.chunk_size)

    def extract(self, cloud, search=None):
        return np.asarray(self.extract_device(cloud, search))

    # -- training -------------------------------------------------------------

    def fit(self, cloud, labels, search=None, sample=None, seed=0):
        """
        Extract features and fit the classifier.  ``sample`` optionally
        caps the number of training points (random subset).
        """
        labels = np.asarray(labels)
        features = self.extract(cloud, search)
        if sample is not None and sample < len(features):
            rows = np.random.RandomState(seed).permutation(
                len(features))[:sample]
            features, labels = features[rows], labels[rows]
        self.classifier.fit(features, labels)
        return self

    # -- inference ------------------------------------------------------------

    def predict_proba_device(self, cloud, search=None):
        features = self.extract_device(cloud, search)
        if hasattr(self.classifier, "proba_device"):
            return self.classifier.proba_device(features)
        # host-side classifier (sklearn baseline): one feature round-trip
        return jnp.asarray(
            self.classifier.predict_proba(np.asarray(features)))

    def predict_proba(self, cloud, search=None):
        return np.asarray(self.predict_proba_device(cloud, search))

    def predict(self, cloud, search=None):
        """Per-point class labels; only int32 labels leave the device."""
        probs = self.predict_proba_device(cloud, search)
        return np.asarray(jnp.argmax(probs, axis=1).astype(jnp.int32))
