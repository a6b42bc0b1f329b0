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

import functools

import numpy as np
import jax
import jax.numpy as jnp

from nimrud_tpu.features import multiscale
from nimrud_tpu.features.multiscale import extract_scaleset_device
from nimrud_tpu.learning.classifiers import param_classifier
from nimrud_tpu.learning import linear as linear_clf
from nimrud_tpu.learning.linear import SoftmaxClassifier
from nimrud_tpu.ops import device_grid, packing, unique


@functools.partial(
    jax.jit,
    static_argnames=("band_specs", "kind", "exclude_radius",
                     "precision", "n_query", "clf_kind", "clf_static",
                     "vector_s_cap", "backend", "interpret",
                     "with_proba", "chunk_slots"))
def _fused_predict_step(query, q_valid, search, s_valid, clf_params,
                        band_specs, kind, exclude_radius, precision,
                        n_query, clf_kind="linear", clf_static=None,
                        dequant=None, attributes=None, vector_s_cap=32,
                        backend="xla", interpret=False, with_proba=True,
                        chunk_slots=None, search_tables=None):
    """
    ONE compiled program for the whole inference step: per band, device
    voxel downsample + tile-grid build + masked-moment features; then the
    softmax classifier and argmax.  A single dispatch per cloud matters
    on remote-attached devices where per-call latency dominates.

    For kind="vector" the attributes are interpolated onto the voxel
    centers on device first (ops.interp, the V_MSO path).
    """
    if dequant is not None:
        # coordinates arrived as uint16 grid steps (half the transfer
        # volume); restore float32 on device
        query = query.astype(jnp.float32) * dequant[3] + dequant[:3]
        search = search.astype(jnp.float32) * dequant[3] + dequant[:3]

    from nimrud_tpu.features import layouts

    bands = []
    # always-on overflow accounting (device scalars; costs a few sums):
    # a serving cloud denser than the capacities were sized for must be
    # LOUD, not silently truncated.  predict() checks these at its d2h.
    vox_dropped = jnp.zeros((), jnp.int32)
    dropped_query = jnp.zeros((), jnp.int32)
    dropped_search = jnp.zeros((), jnp.int32)
    interp_dropped = jnp.zeros((), jnp.int32)
    cand_dropped = jnp.zeros((), jnp.int32)

    # the packed backend runs ALL bands in one shared-query-plan program
    # (fused_extract_packed_multi): one query sort, one (E, q_cap)
    # gather, one caller-order unsort for the whole scaleset
    use_multi = (backend == "packed"
                 and all(len(b) > 5 and b[5] is not None
                         for b in band_specs))
    if search_tables is not None and not use_multi:
        raise ValueError(
            "staged search tables need the packed multi path")
    if use_multi:
        span_prec = {"bf16x2": "bf16x2", "mixed": "bf16x2",
                     "high": "bf16x2"}.get(precision, "highest")
        pack_spec = min((b[1] for b in band_specs),
                        key=lambda s: s.tile_edge)
        # chunk the entry axis when the per-slot buffers (flat
        # classifier input, kernel slabs) would otherwise materialize
        # multiple GB: (8,128) tiling pads the feature lanes of an
        # (N, width) array to 128, so the 10M workload's flat block
        # alone is ~8.6 GB un-chunked
        entry_chunk = _serving_entry_chunk(
            pack_spec.e_cap, pack_spec.q_cap, chunk_slots)
        searches, masks, cattrs = [], [], []
        for band in band_specs:
            if search_tables is not None:
                # designated search map: the dedup (or interp) and the
                # per-tile count tables were computed ONCE at
                # stage_search time; this loop contributes nothing
                searches.append(query[:1, :3].astype(jnp.float32))
                masks.append(jnp.ones((1,), bool))
                cattrs.append(None)
                continue
            centers, mask, ca, v_inc, i_inc = _band_search_prep(
                search, s_valid, attributes, band, kind, vector_s_cap,
                inner_jit=True)
            vox_dropped = vox_dropped + v_inc
            interp_dropped = interp_dropped + i_inc
            cattrs.append(ca)
            searches.append(centers)
            masks.append(mask)
        # classify in (entry, slot) order INSIDE the extract program
        # (per entry chunk when chunked) and unsort only the RESULTS:
        # narrow label/probability sorts instead of the full feature
        # width (the caller-order feature gather was ~15% of the step).
        # The reduce path fills queries without an entry slot with the
        # same zero-feature classification the caller-order path gives.
        reducer = _FusedReducer(clf_kind, clf_static, with_proba)
        (out_rank, q_order), m_stats = \
            device_grid.fused_extract_packed_multi.__wrapped__(
                query, q_valid, tuple(searches), tuple(masks), pack_spec,
                tuple(b[1] for b in band_specs),
                tuple(b[2] for b in band_specs), kind, exclude_radius,
                n_query,
                tuple(b[5] if isinstance(b[5], tuple)
                      else int(b[5]) for b in band_specs),
                interpret, 8, span_prec, with_stats=True, order="rank",
                attributes=tuple(cattrs), entry_chunk=entry_chunk,
                reduce_fn=reducer, reduce_args=clf_params,
                presorted=kind != "vector",
                search_tables=search_tables)
        dropped_query = dropped_query + m_stats["dropped_query"]
        cand_dropped = cand_dropped + m_stats["dropped_candidates"]
        # out_rank is already rank-ordered (in-program compaction
        # sort); ONE more key-value sort restores caller order.  Two
        # near-sorted sorts measured cheaper than either the
        # caller-order position scatter + random gather (6.7 + ~10
        # ms/M) or the rank-position gather (~7.5 ms/M)
        labels_r = out_rank[0]
        if with_proba:
            # the (n, n_classes) probability unsort only rides along
            # when a caller actually wants probabilities (static arg ->
            # the label path compiles without it)
            probs_r = out_rank[1]
            parts = jax.lax.sort(
                (q_order, labels_r)
                + tuple(probs_r[:, i] for i in range(probs_r.shape[1])),
                num_keys=1)
            labels = parts[1][:n_query]
            probs = jnp.stack(parts[2:], axis=1)[:n_query]
        else:
            _, labels = jax.lax.sort_key_val(q_order, labels_r)
            labels = labels[:n_query]
            probs = None
        return (labels, probs,
                {"vox_dropped": vox_dropped,
                 "dropped_query": dropped_query,
                 "dropped_search": dropped_search,
                 "interp_dropped": interp_dropped,
                 "dropped_candidates": cand_dropped})

    for band in band_specs:
        vox_spec, dev_spec, radii = band[:3]
        interp_spec = band[3] if len(band) > 3 else None
        v_cap = band[4] if len(band) > 4 else None
        if kind == "vector":
            from nimrud_tpu.ops import interp
            if interp_spec is not None and attributes.shape[1] > 8:
                # wide attribute blocks: the masked Chebyshev mean rides
                # the moment matmul (same auto rule as the extract path;
                # interp.matmul_interp owns the ball<=edge contract)
                centers, mask, cattrs = interp.matmul_interp(
                    search, s_valid, attributes, vox_spec, interp_spec)
            else:
                centers, mask, cattrs, i_stats = \
                    interp.interp_to_voxels.__wrapped__(
                        search, s_valid, attributes, vox_spec,
                        vector_s_cap, with_stats=True)
                interp_dropped = interp_dropped \
                    + i_stats["dropped_search"]
        else:
            centers, _, mask = unique.unique_voxels(
                search, vox_spec, valid=s_valid)
            cattrs = None
            if v_cap is not None and v_cap < centers.shape[0]:
                # unique_voxels compacts live voxels to the front, so a
                # static prefix slice shrinks every downstream sort /
                # table; voxels beyond the (headroomed) capacity are
                # counted, not silently lost
                vox_dropped = vox_dropped + jnp.sum(
                    mask[v_cap:].astype(jnp.int32))
                centers = centers[:v_cap]
                mask = mask[:v_cap]
        c_cap = band[5] if len(band) > 5 else None
        if backend == "packed" and c_cap is not None \
                and kind != "vector" and not layouts.needs_sazo(kind):
            # dense packed candidate blocks + grid-pipelined kernel:
            # no scalar-core span loop at all (the span-DMA kernel's
            # measured floor); candidates beyond the host-sized c_cap
            # are truncated AND counted
            span_prec = {"bf16x2": "bf16x2", "mixed": "bf16x2",
                         "high": "bf16x2"}.get(precision, "highest")
            feats, b_stats = device_grid.fused_extract_packed.__wrapped__(
                query, q_valid, centers, mask, dev_spec, radii, kind,
                exclude_radius, n_query,
                # single-band path: split (caps, bounds) pass straight
                # through (device_grid._bucketed_slabs)
                c_cap if isinstance(c_cap, tuple) else int(c_cap),
                interpret, 8, span_prec, with_stats=True)
            dropped_query = dropped_query + b_stats["dropped_query"]
            cand_dropped = cand_dropped + b_stats["dropped_candidates"]
            bands.append(feats)
        elif backend == "pallas" and kind != "vector" \
                and not layouts.needs_sazo(kind):
            # the span-DMA kernel: no candidate index table, live spans
            # only -- measured faster than the XLA moment loop on v5e
            span_prec = {"bf16x2": "bf16x2", "mixed": "bf16x2",
                         "high": "bf16x2"}.get(precision, "highest")
            feats, b_stats = device_grid.fused_extract_spans.__wrapped__(
                query, q_valid, centers, mask, dev_spec, radii, kind,
                exclude_radius, n_query, interpret, 8, span_prec,
                with_stats=True)
            dropped_query = dropped_query + b_stats["dropped_query"]
            bands.append(feats)
        else:
            xla_prec = "highest" if precision == "bf16x2" else precision
            feats, b_stats = device_grid.fused_extract.__wrapped__(
                query, q_valid, centers, mask, dev_spec, radii, kind,
                exclude_radius, xla_prec, n_query, True, cattrs)
            dropped_query = dropped_query + b_stats["dropped_query"]
            dropped_search = dropped_search + b_stats["dropped_search"]
            bands.append(feats)
    features = bands[0] if len(bands) == 1 \
        else jnp.concatenate(bands, axis=1)

    probs = classify_features(clf_kind, clf_params, clf_static, features)
    return (jnp.argmax(probs, axis=1).astype(jnp.int32), probs,
            {"vox_dropped": vox_dropped,
             "dropped_query": dropped_query,
             "dropped_search": dropped_search,
             "interp_dropped": interp_dropped,
             "dropped_candidates": cand_dropped})


_CHUNK_SLOTS = 2 * 1024 * 1024    # entry slots above which serving
                                  # chunks the per-slot pipeline (the
                                  # 1M bench stays un-chunked)


def _band_search_prep(search, s_valid, attributes, band, kind,
                      vector_s_cap, inner_jit):
    """ONE band's search-side prep: voxel dedup (tile-sorted) + v_cap
    trim, or vector attribute interpolation.  Shared by
    `_fused_predict_step`'s multi loop and `stage_search` so the two
    cannot drift -- the designated-search bit-identity contract depends
    on both paths producing the same centers/masks/attrs in the same
    order.

    ``inner_jit``: True when already inside a jit trace (use the
    unjitted inner interp); False for the eager stage_search call.
    Returns (centers, mask, attrs_or_None, vox_dropped, interp_dropped).
    """
    vox_spec = band[0]
    v_cap = band[4] if len(band) > 4 else None
    vox_dropped = jnp.zeros((), jnp.int32)
    interp_dropped = jnp.zeros((), jnp.int32)
    if kind == "vector":
        from nimrud_tpu.ops import interp
        icap = band[4] if len(band) > 4 else None
        if icap is not None:
            # packed-backend bands carry the packed-interp plan
            # (band[3] = voxel-edge tile spec, band[4] = candidate
            # cap): attribute means through the packed-candidate
            # machinery.  The gather interp it replaces moves
            # 27 x s_cap lanes per center through serial-searchsorted
            # tables (28 s/step at 200k points on v5e; the 1M fused
            # program crashed the TPU worker).  The fit extract takes
            # the SAME path (multiscale interp_backend auto rule), so
            # fit features match served features.
            centers, mask, ca, i_stats = interp.packed_interp(
                search, s_valid, attributes, vox_spec, band[3], icap,
                with_stats=True, inner_jit=inner_jit)
            return (centers, mask, ca, vox_dropped,
                    interp_dropped + i_stats["dropped_search"])
        # XLA-band fallback (attr_width > 6, or non-packed backends):
        # the gather interp, matching the extract path's choice
        fn = interp.interp_to_voxels.__wrapped__ if inner_jit \
            else interp.interp_to_voxels
        centers, mask, ca, i_stats = fn(
            search, s_valid, attributes, vox_spec, vector_s_cap,
            with_stats=True)
        return (centers, mask, ca, vox_dropped,
                interp_dropped + i_stats["dropped_search"])
    # the dedup's compaction sort orders survivors by this band's fine
    # tile id (tile_spec), so the extract skips its per-band search
    # tile sort (presorted=True downstream); intra-tile order stays
    # voxel-key order -- features are bit-identical (see
    # unique.unique_voxels)
    centers, _, mask = unique.unique_voxels(
        search, vox_spec, valid=s_valid, tile_spec=band[1])
    # NOTE: with tile-ordered centers the v_cap prefix drops the
    # highest-TILE-ID voxels (not the highest keys as the pre-tile_spec
    # code did); either way the loss is counted in vox_dropped and
    # predict() warns on truncation
    if v_cap is not None and v_cap < centers.shape[0]:
        vox_dropped = vox_dropped + jnp.sum(
            mask[v_cap:].astype(jnp.int32))
        centers = centers[:v_cap]
        mask = mask[:v_cap]
    return centers, mask, None, vox_dropped, interp_dropped


def _serving_entry_chunk(e_cap, q_cap, chunk_slots):
    """Entries per serving chunk, or None un-chunked.  Shared by spec
    sizing (host) and the traced predict step so the split-capacity
    host mirror sizes for exactly the chunking the program runs."""
    max_slots = _CHUNK_SLOTS if chunk_slots is None else chunk_slots
    if e_cap * q_cap <= max_slots:
        return None
    # floor to the 256-entry lax.map granularity so the chunk respects
    # the caller's slot budget (a ceiling overshot small budgets by up
    # to 256*q_cap-1 slots -- the knob exists to BOUND peak HBM); the
    # 256-entry floor is the hard minimum the pipeline can chunk at
    return max(max_slots // q_cap // 256, 1) * 256


def _quantize_upload(cloud, c_lo, c_hi, q_bucket):
    """uint16-quantized query upload: ONE copy of the quantization
    contract (65000 divisor, 1e-6 span floor, clip-to-65535 numpy
    fallback) shared by stage() and _stage_with_search so the two
    staging paths can never de-synchronize.  Returns
    (device uint16 (q_bucket, 3), dequant f32 (4,) [lo_xyz, step])."""
    from nimrud_tpu import native

    lo = np.asarray(c_lo, np.float64)
    span = float((np.asarray(c_hi, np.float64) - lo).max())
    step = max(span, 1e-6) / 65000.0
    quant = native.quantize_u16(cloud, lo, step, pad_to=q_bucket)
    if quant is None:
        padded = multiscale._pad_rows_f32(cloud, q_bucket)
        quant = np.clip(np.round(
            (padded.astype(np.float64) - lo) / step),
            0, 65535).astype(np.uint16)
    return (jnp.asarray(quant),
            jnp.asarray(np.append(lo, step).astype(np.float32)))


class _FusedReducer:
    """Hashable (jit-static) per-chunk classifier reduce for
    device_grid.fused_extract_packed_multi: feature rows -> labels
    (+ probabilities when the caller asked for them)."""

    def __init__(self, clf_kind, clf_static, with_proba):
        self._key = (clf_kind, clf_static, bool(with_proba))

    def __hash__(self):
        return hash(self._key)

    def __eq__(self, other):
        return isinstance(other, _FusedReducer) and self._key == other._key

    def __call__(self, clf_params, features):
        clf_kind, clf_static, with_proba = self._key
        probs = classify_features(clf_kind, clf_params, clf_static,
                                  features)
        labels = jnp.argmax(probs, axis=1).astype(jnp.int32)
        return (labels, probs) if with_proba else (labels,)


def classify_features(clf_kind, clf_params, clf_static, features):
    """Jit-composable classifier application (shared by the single-chip
    fused predict and the multi-chip shard_map serving path)."""
    if clf_kind == "linear":
        standardized = (features - clf_params["mean"]) \
            / clf_params["scale"]
        logits = linear_clf.predict_logits(
            {"w": clf_params["w"], "b": clf_params["b"]}, standardized)
        return jax.nn.softmax(logits)
    if clf_kind == "rpte":
        from nimrud_tpu.learning import rpt
        max_depth, d_func = clf_static
        return rpt._ensemble_proba.__wrapped__(
            clf_params, features, max_depth, d_func)
    raise ValueError(f"unsupported fused classifier {clf_kind!r}")


def _cloud_bounds(arr):
    """Per-axis (lo, hi) of an (n, 3) float32 cloud; one native pass."""
    from nimrud_tpu import native
    got = native.minmax3(arr)
    if got is None:
        return arr.min(0), arr.max(0)
    return got


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
                 method="auto", chunk_size=1024,
                 transfer_dtype="float32", vector_s_cap=32,
                 bounds=None, trim_entries=False, backend="auto",
                 precision="highest", serving_chunk_slots=None,
                 tile_m=3):
        self.scaleset = [(float(e), tuple(float(r) for r in rs))
                         for e, rs in scaleset]
        self.kind = kind
        self.exclude_radius = exclude_radius
        self.method = method
        self.chunk_size = chunk_size
        # static per-voxel point capacity for the fused V_MSO interp
        # (kind="vector" only); overflowing voxels truncate -- size it
        # from the sensor's densest voxel
        self.vector_s_cap = int(vector_s_cap)
        # fixed site bounds (lo, hi): per-cloud bounds change the static
        # grid specs, so a stream of jittering clouds would recompile the
        # fused program per cloud.  With fixed bounds every cloud shares
        # ONE compiled program; out-of-bounds points clip to the grid.
        self.bounds = None
        if bounds is not None:
            lo, hi = bounds
            self.bounds = (np.asarray(lo, np.float32)[:3],
                           np.asarray(hi, np.float32)[:3])
        # with fixed bounds, fit() can size e_cap from the fit cloud's
        # measured occupancy (plus headroom) and cache the specs --
        # serving clouds wildly denser than the fit cloud would overflow
        # (counted by with_stats), so this is opt-in
        self.trim_entries = bool(trim_entries)
        # moment-kernel backend for the fused predict: "xla" (masked
        # matmuls over a candidate table), "pallas" (streaming span-DMA
        # kernel; geometry kinds only -- vector/sazo bands fall back to
        # xla), or "packed" (dense gathered candidate blocks +
        # grid-pipelined kernel; computes sazo and vector attribute
        # means natively).  "auto" (default) picks packed on real TPU
        # -- trace-measured fastest on the production workload (146 ms
        # vs 338 ms spans vs ~1.9 s xla per 1M x 3-scale serving step,
        # v5e device trace) -- and xla elsewhere (the Pallas kernels
        # only run interpreted off-TPU, which is for tests).
        # NOTE: "packed" sizes per-entry candidate capacity on the HOST
        # (ops.span_host) at spec-build time; with fixed ``bounds`` the
        # result is cached, without them it recomputes per staged cloud.
        if backend not in ("xla", "pallas", "packed", "auto"):
            raise ValueError(
                "backend must be xla, pallas, packed or auto")
        # "auto" resolves LAZILY (first .backend read): probing
        # jax.default_backend() here would initialize the jax client as
        # a construction side effect -- on this repo's own environment
        # that locks the platform before callers can force CPU
        # in-process (CLAUDE.md: the sitecustomize overrides
        # JAX_PLATFORMS), and construction could block on remote client
        # init
        self._backend = backend
        # "highest" everywhere by default.  For the Pallas backends,
        # "bf16x2" runs the moment dot as three bf16 passes (counts stay
        # exact, features within ~1e-3 abs; validated
        # scripts/validate_precision.py + tests).
        if precision == "bf16x2" and backend not in ("pallas", "packed"):
            raise ValueError(
                "precision='bf16x2' needs backend='pallas' or 'packed' "
                "(named explicitly, not 'auto')")
        self.precision = precision
        # entry-slot budget above which the packed serving program runs
        # its per-slot pipeline (candidate pack + kernel + layout +
        # classifier) chunked under lax.map -- bounds peak HBM at the
        # 10M+ workloads; None = the module default (_CHUNK_SLOTS)
        self.serving_chunk_slots = serving_chunk_slots
        # coarse-tile factor of the single-chip serving grid specs: the
        # entry segments are (x_seg, 1, 1) coarse tiles of m fine tiles
        # each, so candidate rows per entry scale with (m+2)^2 while
        # entry count (rank blocks) barely moves -- smaller m trades
        # more segments (more partial rank blocks) for fewer candidate
        # lanes per entry.
        self.tile_m = int(tile_m)
        if not 1 <= self.tile_m <= 8:
            raise ValueError("tile_m must be in [1, 8]")
        self._spec_cache = None
        self._stage_spec_cache = {}
        self._multichip_cache = {}
        self._multichip_caps_cache = {}
        if transfer_dtype not in ("float32", "uint16"):
            raise ValueError("transfer_dtype must be float32 or uint16")
        self.transfer_dtype = transfer_dtype
        if isinstance(classifier, str):
            self.classifier = param_classifier(
                classifier, **(classifier_kwargs or {}))
        else:
            self.classifier = classifier

    # -- features -------------------------------------------------------------

    def extract_device(self, cloud, search=None, attributes=None):
        """Multiscale features for every point, left on device.

        With fixed site ``bounds=`` every grid (voxel anchor included)
        is the SERVING grid: the features fit() trains on are the
        features predict() serves.  A search-anchored voxel grid is a
        different downsample of the search map -- training on one and
        serving the other silently degrades the classifier whenever the
        model bounds differ from the search cloud's own bounds."""
        if search is None:
            search = cloud
        method = self.method
        tuning = None
        if self.kind == "vector":
            # vector models pass their serving backend so the interp
            # choice (packed vs gather -- different candidate orders
            # and f32 sum orders) matches what predict will serve: fit
            # features must BE the served features (the drive-matrix
            # contract).  The packed interp only engages on the FUSED
            # extractor, so packed vector models force it even for
            # small clouds (the auto threshold would route them
            # through the host interp, a third sum order).
            tuning = {"vector_s_cap": self.vector_s_cap,
                      "backend": self.backend}
            if self.backend == "packed" and attributes is not None \
                    and np.asarray(attributes).shape[1] <= 6 \
                    and method == "auto":
                method = "fused"
        try:
            return extract_scaleset_device(
                cloud, search, self.scaleset, self.kind,
                attributes=attributes,
                exclude_radius=self.exclude_radius, method=method,
                chunk_size=self.chunk_size, tuning=tuning,
                bounds=self.bounds)
        except ValueError:
            if method == self.method:
                raise
            # unfusable configuration: fall back to the caller's method
            # (serving cannot fuse these either, so predict falls back
            # to this same extract path -- still consistent)
            return extract_scaleset_device(
                cloud, search, self.scaleset, self.kind,
                attributes=attributes,
                exclude_radius=self.exclude_radius, method=self.method,
                chunk_size=self.chunk_size, tuning=tuning,
                bounds=self.bounds)

    def extract(self, cloud, search=None, attributes=None):
        return np.asarray(self.extract_device(cloud, search, attributes))

    # -- training -------------------------------------------------------------

    @property
    def backend(self):
        """The serving backend, resolving "auto" on first read (packed
        on real TPU, xla elsewhere) -- deferred so constructing a model
        never initializes the jax client."""
        if self._backend == "auto":
            self._backend = "packed" \
                if jax.default_backend() in ("tpu", "axon") else "xla"
        if self._backend not in ("xla", "pallas", "packed"):
            # catches models pickled under a since-removed backend
            # (e.g. round-3 "ragged"): failing loudly beats silently
            # serving the ~30x-slower XLA fallback
            raise ValueError(
                f"unknown serving backend {self._backend!r} (was it "
                "removed? set model._backend to 'packed', 'pallas' or "
                "'xla')")
        return self._backend

    def fit(self, cloud, labels, search=None, sample=None, seed=0,
            attributes=None):
        """
        Extract features and fit the classifier.  ``sample`` optionally
        caps the number of training points (random subset).  Classifiers
        with a ``fit_device`` method (the softmax model) train entirely
        on device -- features never cross back to the host.
        """
        labels = np.asarray(labels)
        n_classes = int(labels.max() + 1)
        self._spec_cache = None        # a refit resizes everything
        self._stage_spec_cache = {}
        self._multichip_cache = {}     # ...including the mesh programs
        self._multichip_caps_cache = {}
        rows = None
        if sample is not None and sample < len(labels):
            rows = np.random.RandomState(seed).permutation(
                len(labels))[:sample]

        if hasattr(self.classifier, "fit_device"):
            features = self.extract_device(cloud, search, attributes)
            if rows is not None:
                features = jnp.take(features, jnp.asarray(rows), axis=0)
                labels = labels[rows]
            # labels stay HOST-side: fit_device implementations upload
            # them if they need to (the RPT device fit keeps them on
            # host for subset bookkeeping -- a jnp round-trip would be
            # a needless d2h on relay-attached devices)
            self.classifier.fit_device(
                features, labels.astype(np.int32), n_classes=n_classes)
        else:
            features = self.extract(cloud, search, attributes)
            if rows is not None:
                features, labels = features[rows], labels[rows]
            self.classifier.fit(features, labels)

        if self.bounds is not None and self.trim_entries:
            # size the serving specs from the fit cloud's occupancy:
            # entry capacity from coarse-tile populations, and (for the
            # geometry kinds) a per-band search capacity from the voxel
            # count -- unique_voxels compacts live voxels first, so the
            # serving program sorts/tables ~the real voxel count, not
            # the padded cloud bucket.  Headroom x1.25 + 4096; denser
            # serving clouds overflow into the counted vox_dropped
            # diagnostic rather than failing.
            arr = np.asarray(cloud, dtype=np.float32)[:, :3]
            attr_width = None if attributes is None \
                else np.asarray(attributes).shape[1]
            specs = self._fused_band_specs(arr, arr,
                                           attr_width=attr_width)
            if specs is not None:
                trimmed = []
                for band, (edge, _) in zip(specs, self.scaleset):
                    vox, dev, rr = band[:3]
                    interp = band[3] if len(band) > 3 else None
                    c_cap = band[5] if len(band) > 5 else None
                    dev = device_grid.with_entry_estimate(dev, arr)
                    # the packed backend already sized v_cap (same
                    # formula) in _fused_band_specs -- re-deriving it
                    # would re-voxelize the cloud per band (minutes of
                    # serial host prep at 10M points on this box)
                    v_cap = band[4] if len(band) > 4 else None
                    if v_cap is None and self.kind != "vector" \
                            and edge > 0:
                        n_vox = len(multiscale._host_unique_voxels(
                            arr, edge, bounds=self.bounds))
                        v_cap = n_vox + n_vox // 4 + 4096
                        v_cap = -(-v_cap // 16384) * 16384
                    trimmed.append((vox, dev, rr, interp, v_cap, c_cap))
                self._spec_cache = (
                    self._spec_key(arr.shape[0], arr.shape[0],
                                   attr_width),
                    tuple(trimmed))
        return self

    # -- inference ------------------------------------------------------------

    def predict_proba_device(self, cloud, search=None, attributes=None):
        features = self.extract_device(cloud, search, attributes)
        if hasattr(self.classifier, "proba_device"):
            return self.classifier.proba_device(features)
        # host-side classifier (sklearn baseline): one feature round-trip
        return jnp.asarray(
            self.classifier.predict_proba(np.asarray(features)))

    def predict_proba(self, cloud, search=None, attributes=None):
        return np.asarray(
            self.predict_proba_device(cloud, search, attributes))

    # -- single-dispatch fast path ---------------------------------------------

    def _fused_classifier(self):
        """(kind, params, static) for the one-jit predict, or None."""
        clf = self.classifier
        if isinstance(clf, SoftmaxClassifier) and clf.params is not None:
            return "linear", {
                "w": jnp.asarray(clf.params["w"]),
                "b": jnp.asarray(clf.params["b"]),
                "mean": jnp.asarray(clf.mean_),
                "scale": jnp.asarray(clf.scale_),
            }, None
        from nimrud_tpu.learning.rpt import RPTEnsemble
        if isinstance(clf, RPTEnsemble) and clf._tables is not None:
            return "rpte", dict(clf._tables), \
                (clf.max_depth_, clf.d_func)
        return None

    def _spec_key(self, n_query, n_search, attr_width):
        """Cache key shared by _fused_band_specs and fit's trim path:
        size buckets plus (for kind="vector") whether the packed kernel
        can carry the attribute block (<= 6 columns) -- a cached packed
        spec must never serve a wider attribute set."""
        return (multiscale._pow2_bucket(n_query),
                multiscale._pow2_bucket(n_search),
                (attr_width is not None and attr_width <= 6)
                if self.kind == "vector" else None)

    def _fused_band_specs(self, cloud, search, bounds=None,
                          attr_width=None):
        """Static per-band specs for the one-jit predict, or None.

        ``bounds`` optionally carries precomputed (cloud_lo, cloud_hi,
        search_lo, search_hi) so the hot path scans each cloud once.
        ``attr_width`` (kind="vector") decides whether the packed
        kernel can carry the attributes (<= 6 columns) or the band
        falls back to the XLA path.
        """
        if self.exclude_radius is not None:
            return None
        if self._fused_classifier() is None:
            return None
        if any(edge <= 0 for edge, _ in self.scaleset):
            return None
        # (helper shared with fit's trim path -- both sides of the spec
        # caches must agree on the key or serving misses fit-time specs)
        key = self._spec_key(cloud.shape[0], search.shape[0],
                             attr_width)
        if self._spec_cache is not None:
            cached_key, cached = self._spec_cache
            if key == cached_key:
                return cached
        if self.bounds is not None and key in self._stage_spec_cache:
            # with fixed site bounds the specs depend only on the size
            # bucket, so clouds streamed at a non-fit bucket (e.g. the
            # 10M workload served by a 1M-fit model) reuse one program
            # instead of re-sizing (and recompiling) per cloud
            return self._stage_spec_cache[key]
        if bounds is None and self.bounds is not None:
            # fixed site bounds govern every grid, even when the caller
            # (e.g. fit's spec-cache build) passes only a cloud -- a
            # fit cloud smaller than the site must not shrink the grid
            # serving clouds are binned into
            b_lo, b_hi = self.bounds
            bounds = (b_lo, b_hi, b_lo, b_hi)
        if bounds is None:
            c_lo, c_hi = _cloud_bounds(cloud)
            s_lo64, s_hi64 = (c_lo, c_hi) if search is cloud \
                else _cloud_bounds(search)
        else:
            c_lo, c_hi, s_lo64, s_hi64 = bounds
        lo = np.minimum(c_lo, s_lo64).astype(np.float64)
        hi = np.maximum(c_hi, s_hi64).astype(np.float64)
        # voxel grids anchor at the search bounds (VoxelFilter convention)
        s_lo = np.asarray(s_lo64, np.float64)
        s_hi = np.asarray(s_hi64, np.float64)
        q_bucket = multiscale._pow2_bucket(cloud.shape[0])
        try:
            # 256 only when the bands really run a Pallas kernel
            # (vector/sazo kinds fall back to the XLA matmul path,
            # which wants 128 -- dead query slots multiply its mask
            # compute directly)
            from nimrud_tpu.features import layouts as _layouts
            # packed computes SAZO natively and carries up to 6
            # attribute columns (V_MSO); the span kernel does neither
            packed_like = self.backend == "packed"
            use_pallas = (
                (packed_like
                 and (self.kind != "vector"
                      or (attr_width is not None and attr_width <= 6)))
                or (self.backend == "pallas" and self.kind != "vector"
                    and not _layouts.needs_sazo(self.kind)))
            # q_cap: packed wants 512 (wider entries amortize the
            # packing gather -- candidate lanes drop ~40% vs 256
            # because the +-1-tile fringe is shared by more queries);
            # the span kernel wants 256; the XLA matmul path 128
            q_cap = (512 if packed_like else 256) if use_pallas else 128
            dev_specs = [device_grid.make_spec(
                lo, hi, max(radii), n_query=q_bucket,
                voxel_edge=edge, q_cap=q_cap, m=self.tile_m,
                x_seg=32 if use_pallas else 1)
                for edge, radii in self.scaleset]
            if use_pallas and packed_like:
                # entry capacity from the cloud's real segment occupancy
                # (dead entries cost kernel batches AND, at the 10M
                # workload, gigabytes of dead q/slab rows); overflow on
                # a denser serving cloud lands in the counted
                # dropped_query diagnostic
                dev_specs = [device_grid.with_entry_estimate(
                    s, np.asarray(cloud, np.float32)[:, :3])
                    for s in dev_specs]
            # the multi-band packed program shares ONE query plan: the
            # finest-tile band's grid bounds every band's reach
            pack_spec = min(dev_specs, key=lambda s: s.tile_edge)
            host_plan = None
            if use_pallas and packed_like:
                # one host mirror of that shared plan for every band's
                # capacity sizing (re-deriving it per band argsorts the
                # whole cloud each time -- minutes at 10M points)
                from nimrud_tpu.ops import span_host
                q3 = np.asarray(cloud, np.float32)[:, :3]
                host_plan = span_host.pack_plan_np(
                    q3, np.ones(q3.shape[0], bool), pack_spec)
            specs = []
            for (edge, radii), dev_spec in zip(self.scaleset, dev_specs):
                vox_spec = packing.GridSpec.fit_bounds(s_lo, s_hi, edge)
                c_cap = None
                v_cap = None
                if use_pallas and packed_like:
                    # static per-entry candidate capacity, sized on the
                    # HOST against this cloud's voxel-downsampled search
                    # set (a device readback would degrade the relay
                    # process); serving clouds denser than the sizing
                    # cloud overflow into the counted dropped_candidates
                    # diagnostic
                    from nimrud_tpu.ops import span_host
                    # anchor at the grid bounds the serving program's
                    # device dedup uses (the model bounds when fixed),
                    # so capacities measure the ACTUAL voxel set served
                    host_centers = multiscale._host_unique_voxels(
                        np.asarray(search, np.float32)[:, :3], edge,
                        bounds=(s_lo, s_hi))
                    entry_chunk = _serving_entry_chunk(
                        pack_spec.e_cap, pack_spec.q_cap,
                        self.serving_chunk_slots)
                    c_cap = span_host.candidate_caps_split(
                        None, host_centers, dev_spec, plan=host_plan,
                        entry_chunk=entry_chunk)
                    if self.kind != "vector":
                        # per-band search capacity from the real voxel
                        # count: unique_voxels compacts live voxels to
                        # the front, so a static prefix slice shrinks
                        # every downstream sort/table (at 10M points an
                        # untrimmed band carries the full padded bucket
                        # -- gigabytes of dead sorted-search rows)
                        n_vox = len(host_centers)
                        v_cap = n_vox + n_vox // 4 + 4096
                        v_cap = -(-v_cap // 16384) * 16384
                        s_bucket = multiscale._pow2_bucket(
                            search.shape[0])
                        if v_cap >= s_bucket:
                            v_cap = None
                if self.kind == "vector":
                    if use_pallas and packed_like:
                        # the packed interp (ops.interp.packed_interp):
                        # band[3] = its voxel-edge tile spec, band[4] =
                        # its host-sized candidate capacity.  The
                        # gather interp it replaces moves 27 x s_cap
                        # lanes per center through serial-searchsorted
                        # tables -- measured 28 s/step at 200k points
                        # on v5e, and its 1M fused program crashed the
                        # TPU worker (ROADMAP round 5)
                        ispec, icap = multiscale._interp_packed_plan(
                            np.asarray(search, np.float32)[:, :3],
                            vox_spec, lo, hi, (s_lo, s_hi),
                            self.tile_m, host_centers=host_centers)
                        specs.append((vox_spec, dev_spec, radii,
                                      ispec, icap, c_cap))
                        continue
                    # static plan for the matmul attribute interpolation
                    # (ops.interp.interp_to_voxels_matmul): a voxel-edge
                    # tile grid whose queries are the voxel centers
                    s_bucket = multiscale._pow2_bucket(search.shape[0])
                    specs.append((vox_spec, dev_spec, radii,
                                  device_grid.make_spec(
                                      lo, hi, edge, n_query=s_bucket,
                                      s_cap=self.vector_s_cap),
                                  None, c_cap))
                else:
                    specs.append((vox_spec, dev_spec, radii, None,
                                  v_cap, c_cap))
        except ValueError:
            return None
        specs = tuple(specs)
        if self.bounds is not None:
            if len(self._stage_spec_cache) > 8:
                self._stage_spec_cache.clear()
            self._stage_spec_cache[key] = specs
        return specs

    def stage_search(self, search, attributes=None):
        """
        Precompute the search-side serving state for a DESIGNATED search
        map, ONCE: per-band device voxel dedup (tile-sorted), v_cap
        trimming, attribute interpolation (kind="vector"), and the
        per-tile span count tables.  Clouds then stream against the map
        via ``stage(cloud, staged_search=handle)`` and the per-cloud
        serving step skips all of that search-side work (~10 ms of the
        58 ms 1M-point step on v5e: dedup sorts + count scatters).

        This realizes the reference's designated-search workflows
        (vmso_APC's search asset, reference nimrud/prototypes/
        apc.py:2357-2529) as an amortization: the ONLY valid per-cloud
        reuse on TPU -- sort costs are data-independent (bitonic
        networks), so "warm starting" a changed cloud's sorts saves
        nothing, but an UNCHANGED search map's tables are simply
        correct to reuse.

        Requires fixed ``bounds=``, the packed backend, and a fused
        configuration.  Overflow (v_cap / interp truncation) is counted
        into the handle as device scalars; check it ONCE after staging
        with :meth:`search_overflow` (one small device read), or observe
        it merged into ``predict_staged(..., with_diag=True)``'s
        counters.  :meth:`predict_stream` deliberately never reads
        diagnostics (transfer discipline: a device->host read in the
        hot loop can be catastrophically slow on remote-attached
        devices), so staged overflow is silent there unless you check.
        """
        if self.bounds is None:
            raise ValueError(
                "stage_search needs fixed bounds= (one grid for the "
                "whole stream)")
        if self.backend != "packed":
            raise ValueError(
                "stage_search supports the packed backend only")
        if (self.kind == "vector") != (attributes is not None):
            raise ValueError(
                "attributes required iff kind='vector'")
        search = np.asarray(search, np.float32)[:, :3]
        attr_width = None if attributes is None \
            else np.asarray(attributes).shape[1]
        if attr_width is not None and attr_width > 6:
            raise ValueError(
                "stage_search carries at most 6 attribute columns "
                "(the packed kernel's budget)")
        specs = self._fused_band_specs(search, search,
                                       attr_width=attr_width)
        if specs is None:
            raise ValueError("fused path does not apply to this "
                             "configuration")
        s_bucket = multiscale._pow2_bucket(search.shape[0])
        search_dev = jnp.asarray(multiscale._pad_rows_f32(
            search, s_bucket))
        attrs_dev = None if attributes is None else jnp.asarray(
            multiscale._pad_rows_f32(
                np.asarray(attributes, np.float32), s_bucket))
        s_valid = jnp.arange(s_bucket) < search.shape[0]

        tables = []
        vox_dropped = jnp.zeros((), jnp.int32)
        interp_dropped = jnp.zeros((), jnp.int32)
        for band in specs:
            # the SAME prep _fused_predict_step's multi loop runs per
            # cloud (one shared helper, so the two cannot drift)
            centers, mask, ca, v_inc, i_inc = _band_search_prep(
                search_dev, s_valid, attrs_dev, band, self.kind,
                self.vector_s_cap, inner_jit=False)
            vox_dropped = vox_dropped + v_inc
            interp_dropped = interp_dropped + i_inc
            tables.append(device_grid._search_tables(
                centers, mask, band[1], attrs=ca,
                presorted=self.kind != "vector"))
        return {
            "tables": tuple(tables),
            "search_host": search,
            "attr_width": attr_width,
            "vox_dropped": vox_dropped,
            "interp_dropped": interp_dropped,
            "config_key": self._search_handle_key(),
        }

    def search_overflow(self, handle):
        """The overflow counters a :meth:`stage_search` handle recorded
        (``vox_dropped``: voxels beyond the trimmed per-band search
        capacity; ``interp_dropped``: vector-interp voxel overflow), as
        host ints.  This is the ONE intended device->host read of the
        designated-search setup phase -- call it after staging, before
        the stream, so truncation of the search map never serves
        silently.  Nonzero means the map is denser than what the
        capacities were sized from: rebuild the handle after fitting
        (or sizing bounds/caps) against this search cloud."""
        return {"vox_dropped": int(handle["vox_dropped"]),
                "interp_dropped": int(handle["interp_dropped"])}

    def _search_handle_key(self):
        """Everything the stage_search tables depend on: a handle built
        under one configuration must not silently serve another (the
        tables encode per-fine-tile counts on grids derived from these
        values, and a mismatch produces garbage labels with zero
        diagnostics)."""
        lo, hi = self.bounds
        return (tuple(self.scaleset), self.kind, self.exclude_radius,
                lo.tobytes(), hi.tobytes(), self.tile_m,
                self.vector_s_cap, self.trim_entries)

    def _stage_with_search(self, cloud, handle):
        """stage() against a stage_search handle: upload the query
        cloud only; the search side rides the precomputed tables."""
        if self.bounds is None:
            raise ValueError(
                "staged_search serving needs fixed bounds= (the handle "
                "was built against one grid)")
        if self.backend != "packed":
            raise ValueError(
                "staged_search serving supports the packed backend only")
        if handle.get("config_key") != self._search_handle_key():
            raise ValueError(
                "stage_search handle was built under a different model "
                "configuration (scaleset / kind / bounds / tile_m / "
                "capacities); rebuild it with this model's "
                "stage_search()")
        cloud = np.asarray(cloud, dtype=np.float32)[:, :3]
        specs = self._fused_band_specs(
            cloud, handle["search_host"],
            attr_width=handle["attr_width"])
        if specs is None:
            return None
        n_query = cloud.shape[0]
        q_bucket = multiscale._pow2_bucket(n_query)
        # ALWAYS f32 uploads here, even under transfer_dtype="uint16":
        # quantizing the query while the handle's tables hold raw f32
        # search rows would flip d2 boundary decisions and break the
        # bit-identity contract with the per-cloud path (which uploads
        # distinct-search queries as f32).  The uint16 fast upload is a
        # SELF-search optimization, where both sides quantize together.
        query_dev = jnp.asarray(multiscale._pad_rows_f32(cloud, q_bucket))
        # the search argument of the step is a 1-row dummy: every
        # search-side consumer reads the staged tables instead
        return {
            "query": query_dev, "search": query_dev[:1],
            "n_query": n_query, "n_search": 1,
            "q_bucket": q_bucket, "s_bucket": 1,
            "specs": specs, "dequant": None, "attributes": None,
            "search_tables": handle["tables"],
            "staged_vox_dropped": handle["vox_dropped"],
            "staged_interp_dropped": handle["interp_dropped"],
        }

    def stage(self, cloud, search=None, attributes=None,
              staged_search=None):
        """
        Host prep + upload for one cloud on the fused path: quantize (or
        pad) on the host and ``device_put`` the coordinates.  Returns an
        opaque staged handle for :meth:`predict_staged`, or None when the
        fused single-dispatch path does not apply to this configuration.

        ``staged_search``: a :meth:`stage_search` handle -- the cloud
        streams against that designated search map and the per-cloud
        step skips all search-side work (attributes then belong to the
        handle, not this call).

        Staging is the only host-side work in the hot loop, so callers
        streaming many clouds can overlap it with device compute (see
        :meth:`predict_stream`).
        """
        if staged_search is not None:
            if search is not None or attributes is not None:
                raise ValueError(
                    "with staged_search, the search cloud and its "
                    "attributes come from the stage_search handle")
            return self._stage_with_search(cloud, staged_search)
        if (self.kind == "vector") != (attributes is not None):
            return None
        same = search is None or search is cloud
        cloud = np.asarray(cloud, dtype=np.float32)[:, :3]
        search_arr = cloud if same \
            else np.asarray(search, dtype=np.float32)[:, :3]
        if self.bounds is not None:
            c_lo, c_hi = self.bounds
            s_lo, s_hi = self.bounds
        else:
            c_lo, c_hi = _cloud_bounds(cloud)
            s_lo, s_hi = (c_lo, c_hi) if same \
                else _cloud_bounds(search_arr)
        specs = self._fused_band_specs(
            cloud, search_arr, bounds=(c_lo, c_hi, s_lo, s_hi),
            attr_width=None if attributes is None
            else np.asarray(attributes).shape[1])
        if specs is None:
            return None
        n_query = cloud.shape[0]
        q_bucket = multiscale._pow2_bucket(n_query)
        s_bucket = multiscale._pow2_bucket(search_arr.shape[0])

        dequant = None
        if self.transfer_dtype == "uint16" and search_arr is cloud \
                and s_bucket == q_bucket:
            query_dev, dequant = _quantize_upload(
                cloud, c_lo, c_hi, q_bucket)
            search_dev = query_dev
        else:
            query_dev = jnp.asarray(
                multiscale._pad_rows_f32(cloud, q_bucket))
            if search_arr is cloud and s_bucket == q_bucket:
                search_dev = query_dev        # one upload, not two
            else:
                search_dev = jnp.asarray(
                    multiscale._pad_rows_f32(search_arr, s_bucket))

        attrs_dev = None
        if attributes is not None:
            attrs_dev = jnp.asarray(multiscale._pad_rows_f32(
                np.asarray(attributes, dtype=np.float32), s_bucket))

        return {
            "query": query_dev, "search": search_dev,
            "n_query": n_query, "n_search": search_arr.shape[0],
            "q_bucket": q_bucket, "s_bucket": s_bucket,
            "specs": specs, "dequant": dequant, "attributes": attrs_dev,
        }

    def predict_staged(self, staged, with_proba=False, with_diag=False):
        """Labels (and optionally probabilities) for a staged cloud, as
        DEVICE arrays; one compiled dispatch, no host transfer.

        ``with_diag`` additionally returns the overflow-counter dict
        (device scalars, computed on every call): ``vox_dropped``
        (voxels beyond the trimmed per-band search capacity),
        ``dropped_query`` (queries left without an entry slot),
        ``dropped_search`` (search points beyond a fine tile's s_cap on
        the XLA path) and ``interp_dropped`` (vector-interp voxel
        overflow).  Nonzero means the serving cloud is denser than what
        the capacities were sized from; :meth:`predict` warns on these
        automatically.
        """
        clf_kind, clf_params, clf_static = self._fused_classifier()
        labels, probs, diag = _fused_predict_step(
            staged["query"],
            jnp.arange(staged["q_bucket"]) < staged["n_query"],
            staged["search"],
            jnp.arange(staged["s_bucket"]) < staged["n_search"],
            clf_params, staged["specs"], self.kind, None, self.precision,
            staged["n_query"], clf_kind, clf_static, staged["dequant"],
            staged.get("attributes"), self.vector_s_cap,
            self.backend,
            jax.default_backend() not in ("tpu", "axon"),
            with_proba=with_proba,
            chunk_slots=self.serving_chunk_slots,
            search_tables=staged.get("search_tables"))
        if with_diag and "staged_vox_dropped" in staged:
            # designated-search overflow was counted once at
            # stage_search time (device scalars; no transfer here);
            # skipped entirely when the caller doesn't want diag --
            # the adds would be extra per-cloud dispatches
            diag = dict(diag)
            diag["vox_dropped"] = diag["vox_dropped"] \
                + staged["staged_vox_dropped"]
            diag["interp_dropped"] = diag["interp_dropped"] \
                + staged["staged_interp_dropped"]
        out = (labels,)
        if with_proba:
            out = out + (probs,)
        if with_diag:
            out = out + (diag,)
        return out if len(out) > 1 else labels

    def predict_stream(self, clouds, staged_search=None):
        """
        Classify a stream of clouds, overlapping each cloud's host prep +
        upload with the previous cloud's work: staging runs one cloud
        ahead in a worker thread (device_put can block on slow links, so
        async dispatch alone is not enough).  Yields per-point label
        DEVICE arrays in order; batch the host reads after the stream
        drains (transfer discipline).

        ``staged_search``: a :meth:`stage_search` handle -- every cloud
        in the stream classifies against that designated search map and
        the per-cloud step skips all search-side work (the reference's
        designated-search serving, nimrud/prototypes/apc.py:2357-2529).
        """
        from concurrent.futures import ThreadPoolExecutor

        def finish(item):
            cloud, future = item
            staged = future.result()
            if staged is None:
                if staged_search is not None:
                    # never silently swap the designated map for
                    # self-search: that serves DIFFERENT features
                    raise ValueError(
                        "designated-search streaming requires the "
                        "fused packed path; this configuration does "
                        "not support it")
                return self.predict_device(cloud)
            return self.predict_staged(staged)

        with ThreadPoolExecutor(max_workers=1) as pool:
            pending = None
            for cloud in clouds:
                nxt = (cloud, pool.submit(
                    self.stage, cloud, staged_search=staged_search))
                if pending is not None:
                    yield finish(pending)
                pending = nxt
            if pending is not None:
                yield finish(pending)

    def predict_device(self, cloud, search=None, attributes=None):
        """
        Per-point class labels as a DEVICE array -- no device-to-host
        transfer happens.  The transfer-disciplined serving pattern:
        stream clouds through this and batch the label downloads
        (host reads can be expensive on remote-attached devices).
        """
        staged = self.stage(cloud, search, attributes)
        if staged is not None:
            # label-only program: with_proba is STATIC on the packed
            # backend (the probability reduce + its (n, n_classes)
            # unsort gather compile out), and it matches the program
            # predict/predict_stream/bench all run -- one compiled
            # serving program, not a proba fork per entry point
            return self.predict_staged(staged)
        probs = self.predict_proba_device(cloud, search, attributes)
        return jnp.argmax(probs, axis=1).astype(jnp.int32)

    def predict(self, cloud, search=None, attributes=None):
        """Per-point class labels; only int32 labels leave the device.

        This path already pays a device->host read for the labels, so it
        also fetches the (tiny) overflow counters and WARNS when the
        cloud was denser than the model's fixed capacities -- silent
        truncation must be loud somewhere, and transfer-free serving
        (predict_device / predict_staged) cannot afford the read.
        """
        staged = self.stage(cloud, search, attributes)
        if staged is None:
            return np.asarray(
                self.predict_device(cloud, search, attributes))
        labels, diag = self.predict_staged(staged, with_diag=True)
        labels, diag = jax.device_get((labels, diag))
        dropped = {k: int(v) for k, v in diag.items() if int(v) > 0}
        if dropped:
            import warnings
            warnings.warn(
                "serving cloud overflowed fixed capacities "
                f"({dropped}); affected points got zero/truncated "
                "features.  Refit with larger capacities or "
                "trim_entries sized on a denser cloud.",
                RuntimeWarning, stacklevel=2)
        return np.asarray(labels)

    # -- multi-chip serving -----------------------------------------------------

    def _size_multichip_caps(self, cloud, lo, hi, rows):
        """Segment-wide per-band candidate capacities for the packed
        multichip program (host-side; see predict_multichip).

        The sizing plan must enumerate EVERY populated segment of the
        full cloud: the per-shard dev specs budget e_cap for ``rows``
        queries only, and pack_plan_np drops entries past that budget
        -- measuring the whole cloud against them would leave later
        (high y/z) segments unmeasured and the caps undersized on dense
        sites.  The grid geometry (qdims, x_seg, segments) depends only
        on bounds+edge, so a full-cloud-capacity twin of the pack spec
        aligns exactly."""
        from nimrud_tpu.ops import span_host
        dev_specs = [device_grid.make_spec(
            lo, hi, max(radii), n_query=rows, voxel_edge=edge,
            q_cap=256, x_seg=32) for edge, radii in self.scaleset]
        pack_idx = min(range(len(dev_specs)),
                       key=lambda i: dev_specs[i].tile_edge)
        pack_edge, pack_radii = self.scaleset[pack_idx]
        size_pack = device_grid.make_spec(
            lo, hi, max(pack_radii), n_query=len(cloud),
            voxel_edge=pack_edge, q_cap=256, x_seg=32)
        size_plan = span_host.pack_plan_np(
            cloud, np.ones(len(cloud), bool), size_pack)
        return tuple(span_host.candidate_cap(
            cloud,
            multiscale._host_unique_voxels(cloud, edge,
                                           bounds=(lo, hi)),
            dev_spec, pack_spec=size_pack, segment_wide=True,
            plan=size_plan)
            for (edge, _), dev_spec in zip(self.scaleset, dev_specs))

    def predict_multichip(self, cloud, mesh_shape, mesh=None,
                          attributes=None):
        """
        Per-point class labels computed across a 2-D device mesh: the
        cloud is sharded into rectangular columns, each device runs the
        whole fused pipeline (halo exchange over ICI, device voxelize +
        tile build + moments + classifier) on its shard, and the int32
        labels are reassembled in caller order.

        Requires a fitted fused-path configuration (voxelized bands, a
        device classifier, no exclude_radius).  ``kind="vector"`` (the
        V_MSO path) additionally needs per-point ``attributes`` (N, A);
        the attribute columns shard and halo-exchange with their points
        and each shard interpolates them onto its voxel centers.
        """
        from nimrud_tpu.parallel import mesh as pmesh
        from nimrud_tpu.parallel import tiles

        fused = self._fused_classifier()
        if fused is None:
            raise ValueError(
                "predict_multichip needs a fitted device classifier "
                "(linear or rpte)")
        if self.exclude_radius is not None \
                or any(edge <= 0 for edge, _ in self.scaleset):
            raise ValueError(
                "predict_multichip supports the fused path only "
                "(voxelized bands, no exclude_radius)")
        n_attr = 0
        if self.kind == "vector":
            if attributes is None:
                raise ValueError(
                    "kind='vector' multichip serving needs attributes")
            attributes = np.asarray(attributes, np.float32)
            n_attr = attributes.shape[1]
        clf_kind, clf_params, clf_static = fused

        cloud = np.asarray(cloud, dtype=np.float32)[:, :3]
        if self.bounds is not None:
            lo, hi = (np.asarray(b, np.float64) for b in self.bounds)
        else:
            c_lo, c_hi = _cloud_bounds(cloud)
            lo = np.asarray(c_lo, np.float64)
            hi = np.asarray(c_hi, np.float64)

        if mesh is None:
            # reuse one Mesh per shape: the compile cache below keys on
            # the mesh identity, and a fresh Mesh every call would make
            # every lookup miss (re-jitting the whole fused program)
            if not hasattr(self, "_mesh_cache"):
                self._mesh_cache = {}
            shape_key = tuple(int(s) for s in mesh_shape)
            mesh = self._mesh_cache.get(shape_key)
            if mesh is None:
                mesh = pmesh.make_mesh_2d(mesh_shape)
                self._mesh_cache[shape_key] = mesh
        # halo must cover the largest radius PLUS a voxel edge: a voxel
        # center within the radius can be induced by points up to a cell
        # away across the shard boundary
        buffer = max(max(r) for _, r in self.scaleset) \
            + max(e for e, _ in self.scaleset)
        shards = tiles.shard_cloud_2d(
            cloud, mesh_shape, buffer,
            extras=None if n_attr == 0 else [attributes])
        blocks = shards["blocks"]
        if n_attr:
            # attributes ride as extra block COLUMNS so the device-side
            # halo exchange carries them with their points
            blocks = np.concatenate([blocks, shards["extras"][0]],
                                    axis=2)

        mc_backend = self.backend
        c_caps = None
        interp_plans = None
        if mc_backend == "packed" \
                and (self.kind != "vector" or n_attr <= 6):
            # (mirror of mesh.make_fused_predict_2d's use_packed gate:
            # wide-attribute vector serving falls back to the span/XLA
            # shard program, which never reads candidate caps -- don't
            # spend seconds of host argsort sizing them)
            # per-band candidate capacities, sized host-side against the
            # FULL cloud with segment-wide entry extents -- each shard
            # packs its own query subset into entries the host mirror
            # cannot reproduce, but every packing's candidate sets are
            # subsets of the segment-wide rows (span_host.candidate_cap)
            from nimrud_tpu.ops import span_host
            rows = shards["blocks"].shape[1]
            # with fixed site bounds, size the caps ONCE per (mesh
            # shape, shard rows) and reuse them for the whole stream --
            # the sizing pass argsorts the full cloud (seconds of host
            # time at 10M points), and per-cloud caps would land in the
            # compile key below, recompiling the fused program whenever
            # a jittering cloud's measured maximum crossed a 128-lane
            # boundary.  Denser-than-first clouds overflow into the
            # counted per-shard diagnostic + warning, matching the
            # single-chip fixed-bounds contract.
            caps_key = None
            if self.bounds is not None:
                if not hasattr(self, "_multichip_caps_cache"):
                    self._multichip_caps_cache = {}
                caps_key = (tuple(int(s) for s in mesh_shape), rows)
                c_caps = self._multichip_caps_cache.get(caps_key)
            if c_caps is None:
                c_caps = self._size_multichip_caps(cloud, lo, hi, rows)
                if caps_key is not None:
                    self._multichip_caps_cache[caps_key] = c_caps
            if self.kind == "vector":
                # per-band packed-interp plans (segment-wide single
                # caps -- shard packings cannot share split-bucket rank
                # cuts): each shard interpolates through the packed
                # candidate machinery instead of the gather interp,
                # which crashed the TPU worker at production shard
                # sizes (ROADMAP round 5)
                plans_key = None if caps_key is None \
                    else caps_key + ("interp",)
                if plans_key is not None:
                    interp_plans = self._multichip_caps_cache.get(
                        plans_key)
                if interp_plans is None:
                    interp_plans = tuple(
                        multiscale._interp_packed_plan(
                            cloud,
                            packing.GridSpec.fit_bounds(lo, hi, edge),
                            lo, hi, (lo, hi), self.tile_m,
                            segment_wide=True)
                        for edge, _ in self.scaleset)
                    if plans_key is not None:
                        self._multichip_caps_cache[plans_key] = \
                            interp_plans
        # one compiled program per (mesh, static shard shape, backend):
        # streams of same-size clouds hit the cache (halo caps are
        # pow2-bucketed, so they repeat for same-scene clouds); fit()
        # clears it alongside the single-chip spec cache
        key = (id(mesh), tuple(int(s) for s in mesh_shape),
               int(shards["blocks"].shape[1]),
               int(shards["halo_x"]), int(shards["halo_y"]),
               mc_backend, c_caps, n_attr, interp_plans)
        if not hasattr(self, "_multichip_cache"):   # pre-cache pickles
            self._multichip_cache = {}
        run = self._multichip_cache.get(key)
        if run is None:
            run = pmesh.make_fused_predict_2d(
                mesh, shards["halo_x"], shards["halo_y"], self.scaleset,
                self.kind, lo, hi, shards["blocks"].shape[1],
                clf_kind, clf_params, clf_static,
                precision=self.precision, backend=mc_backend,
                c_caps=c_caps, n_attr=n_attr,
                vector_s_cap=self.vector_s_cap,
                interp_plans=interp_plans)
            if len(self._multichip_cache) > 8:  # bound compiled programs
                self._multichip_cache.clear()
            self._multichip_cache[key] = run
        labels, dropped = run(jnp.asarray(blocks),
                              jnp.asarray(shards["valid"]))
        n_dropped = int(np.asarray(dropped).sum())
        if n_dropped:
            import warnings
            warnings.warn(
                f"multichip serving truncated {n_dropped} candidates "
                "or interpolation rows (per-shard packing denser than "
                "the host sizing bound); refit or raise the capacity "
                "margin.", RuntimeWarning, stacklevel=2)
        return tiles.unshard(
            np.asarray(labels), shards["valid"], shards["order"],
            len(cloud)).astype(np.int32)
