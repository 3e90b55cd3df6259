"""Host -> device input pipeline.

Replaces the reference's pinned-memory DataLoader with seeded worker
processes (train_adv_supervised_segmentation_triplet.py:110-116): here the
host only collates raw fixed-shape numpy batches; the ~12-stage augmentation
runs jitted on device (ops/augment.py), and `jax.device_put` with an explicit
batch sharding feeds the mesh.

``CooperativeBatcher`` reproduces the batch-halving semantics of
``keep_orig_image_label_pair_for_training`` (train...py:103-108 + dataset
side base_segmentation_dataset.py:149-186): each raw sample contributes BOTH
an augmented view and its center-cropped original, concatenated along batch
-> effective batch = 2x loader batch.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, Optional, Tuple

import jax
import numpy as np

from cooperative_training_and_latent_space_data_augmentation_tpu.data.base import (
    SegDatasetBase,
)
from cooperative_training_and_latent_space_data_augmentation_tpu.ops.augment import (
    make_batch_augment,
    make_batch_eval_transform,
    make_batch_train_pipeline,
    make_batch_train_pipeline_indexed,
)

# Auto device-cache datasets up to this many bytes of padded image+label
# data (v5e has 16 GB HBM; the full 70-subject ACDC slice set at 224^2 is
# ~0.5 GB): per-iteration host->device sample transfer over the tunneled
# backend otherwise rivals the train-step time itself.
DEVICE_CACHE_LIMIT_BYTES = 2 * 1024 ** 3


class BatchSampler:
    """Shuffled epoch iterator over dataset indices (seeded, reproducible).

    ``wrap=True`` keeps every batch at ``batch_size`` by tiling from the
    start of the permutation (fixed shapes for the hot jitted train step;
    within-epoch duplicates are acceptable for TRAINING only).
    ``wrap=False`` yields the ragged tail batch — required for EVALUATION,
    where wrap-padding would double-count samples in the metrics and skew
    model selection.
    """

    def __init__(self, n: int, batch_size: int, shuffle: bool = True,
                 drop_last: bool = False, seed: Optional[int] = None,
                 wrap: bool = True):
        self.n = n
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.wrap = wrap
        self.rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        if self.drop_last:
            return self.n // self.batch_size
        return (self.n + self.batch_size - 1) // self.batch_size

    def epoch(self) -> Iterator[np.ndarray]:
        order = (self.rng.permutation(self.n) if self.shuffle
                 else np.arange(self.n))
        for i in range(0, self.n, self.batch_size):
            batch = order[i:i + self.batch_size]
            if self.drop_last and len(batch) < self.batch_size:
                break
            if self.wrap and len(batch) < self.batch_size:
                # tile (np.resize) so shortfalls larger than n still fill
                extra = np.resize(order, self.batch_size - len(batch))
                batch = np.concatenate([batch, extra])
            yield batch


def collate(dataset: SegDatasetBase, indices: np.ndarray) -> Dict[str, np.ndarray]:
    images, labels = [], []
    for i in indices:
        s = dataset[int(i)]
        images.append(s["image"])
        labels.append(s["label"])
    return {"image": np.stack(images).astype(np.float32),
            "label": np.stack(labels).astype(np.int32)}


def prefetch(iterator: Iterator, size: int = 2) -> Iterator:
    """Run an iterator on a background thread with a bounded queue, so host
    collation overlaps device compute (replaces the reference's DataLoader
    worker processes, train...py:113-116 — the heavy augmentation already
    runs on device, only numpy collation needs hiding)."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded put that gives up if the consumer abandoned the iterator
        # (e.g. max_iteration break mid-epoch) — otherwise the producer
        # thread would park on q.put forever, leaking itself + its batches.
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for item in iterator:
                if not _put(item):
                    return
            _put(_END)
        except BaseException as e:  # surface errors on the consumer side
            _put(e)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


class CooperativeBatcher:
    """Yields device-ready training batches at crop resolution.

    batch_size is the EFFECTIVE batch (reference `learning.batch_size`); with
    keep_orig=True the loader samples batch_size//2 raw slices and emits
    [augmented || original] (train...py:48-60,103-108).
    """

    def __init__(self, dataset: SegDatasetBase, batch_size: int,
                 policy_name: str, pad_hw=(224, 224), crop_hw=(192, 192),
                 num_classes: int = 4, keep_orig: bool = True,
                 shuffle: bool = True, seed: Optional[int] = 0,
                 sharding=None, device_cache: Optional[bool] = None):
        self.dataset = dataset
        self.keep_orig = keep_orig
        raw_bs = max(batch_size // 2, 1) if keep_orig else batch_size
        self.raw_bs = raw_bs
        self.sampler = BatchSampler(len(dataset), raw_bs, shuffle=shuffle,
                                    seed=seed)
        self.augment = make_batch_augment(policy_name, pad_hw, crop_hw,
                                          num_classes)
        self.eval_transform = make_batch_eval_transform(pad_hw, crop_hw)
        self.pipeline = make_batch_train_pipeline(policy_name, pad_hw, crop_hw,
                                                  num_classes, keep_orig)
        self.pipeline_idx = make_batch_train_pipeline_indexed(
            policy_name, pad_hw, crop_hw, num_classes, keep_orig)
        self.sharding = sharding
        if device_cache is None:
            # ~5 bytes/pixel: f32 image + uint8 label, padded resolution
            est = len(dataset) * pad_hw[0] * pad_hw[1] * 5
            device_cache = est <= DEVICE_CACHE_LIMIT_BYTES
        self.device_cache = device_cache
        self._cached = None

    def _device_dataset(self):
        """Upload the full padded dataset once (image f32 + label uint8);
        per-epoch cost drops to one small index transfer per batch.  Under a
        mesh (``sharding`` set) the cache is replicated across the devices
        so the sharded fused-epoch scan reads it locally every step instead
        of re-broadcasting per call."""
        if self._cached is None:
            raw = collate(self.dataset, np.arange(len(self.dataset)))
            img = raw["image"]
            lbl = raw["label"].astype(np.uint8)
            if self.sharding is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                repl = NamedSharding(self.sharding.mesh, PartitionSpec())
                self._cached = (jax.device_put(img, repl),
                                jax.device_put(lbl, repl))
            else:
                self._cached = (jax.numpy.asarray(img),
                                jax.numpy.asarray(lbl))
        return self._cached

    def __len__(self) -> int:
        return len(self.sampler)

    def epoch_index_matrix(self) -> np.ndarray:
        """(K, raw_batch) int32 index matrix for one epoch — the host side
        of the fused-epoch path (see :meth:`fused_epoch_runner`).  Consumes
        the SAME sampler stream as :meth:`epoch`, so fused and streaming
        epochs see identical batch orders."""
        return np.stack(list(self.sampler.epoch())).astype(np.int32)

    def fused_epoch_runner(self, train_step_body, donate: bool = True,
                           mesh=None, data_axis: str = "data"):
        """ONE-dispatch epoch: lax.scan over (augment + train step) against
        the device-resident dataset.

        Per-iteration dispatch over the tunneled backend costs an RPC round
        trip each; at the measured 143 ms step that overhead DOMINATES the
        epoch (epoch-level throughput 31.7 slices/s vs 140 step-marginal,
        RESULTS.md).  Scanning the whole epoch into one jitted call sends
        one index matrix + two keys per epoch instead of 2K dispatches.

        Key schedule matches the streaming path exactly: the batch key
        splits once per batch (as :meth:`epoch` does) and the step key
        splits once per step (as the driver loop does), so fused and
        streaming training produce identical parameter trajectories
        (pinned by tests/test_data.py).

        ``mesh`` (VERDICT r3 #2): shard the scanned epoch data-parallel over
        the mesh.  State/dataset/index-matrix ride in replicated; inside the
        scan body the per-step index vector is sharding-constrained over the
        ``data_axis``, so the gather, the device augmentation and the train
        step all run on local batch shards, with the gradient psum inserted
        by the partitioner — the SAME dispatch profile as the single-chip
        fused epoch (one RPC per epoch), not the per-iteration streaming
        loop the reference uses (train_adv...triplet.py:158-235).  Requires
        ``raw_bs % mesh.size == 0``.

        Returns ``run(state, img_all, lbl_all, idx_mat, batch_key,
        step_key) -> (state, next_step_key, stacked_metrics)``.

        ``donate=False`` keeps the input state buffers alive (needed by the
        driver's pipelined mode, which may still checkpoint/validate epoch
        k's state after dispatching epoch k+1); the cost is one extra
        state-sized buffer, negligible beside the cached dataset.
        """
        pipeline = getattr(self.pipeline_idx, "__wrapped__", self.pipeline_idx)

        batch_ns = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            n_dev = mesh.size
            assert self.raw_bs % n_dev == 0, (
                f"fused sharded epoch needs raw batch {self.raw_bs} "
                f"divisible over the {n_dev}-device mesh")
            batch_ns = lambda ndim: NamedSharding(  # noqa: E731
                mesh, PartitionSpec(data_axis, *([None] * (ndim - 1))))
            repl = NamedSharding(mesh, PartitionSpec())

        def _run(state, img_all, lbl_all, idx_mat, batch_key, step_key):
            def body(carry, idx):
                st, bk, sk = carry
                bk, sub = jax.random.split(bk)
                if batch_ns is not None:
                    # shard the index vector -> the dataset gather, the
                    # augmentation and the train step below all partition
                    # over the batch axis
                    idx = jax.lax.with_sharding_constraint(idx, batch_ns(1))
                batch = pipeline(sub, img_all, lbl_all, idx)
                if batch_ns is not None:
                    batch = {k: jax.lax.with_sharding_constraint(
                        v, batch_ns(v.ndim)) for k, v in batch.items()}
                sk, skey = jax.random.split(sk)
                st, metrics = train_step_body(st, batch, skey)
                return (st, bk, sk), metrics

            (st, _, sk), ms = jax.lax.scan(
                body, (state, batch_key, step_key), idx_mat)
            return st, sk, ms

        jit_kwargs = dict(donate_argnums=(0,) if donate else ())
        if mesh is not None:
            jit_kwargs.update(in_shardings=(repl,) * 6,
                              out_shardings=(repl, repl, repl))
        return jax.jit(_run, **jit_kwargs)

    def raw_epoch(self) -> Iterator[Dict[str, np.ndarray]]:
        """Numpy-only collation — safe to run on a prefetch thread."""
        for indices in self.sampler.epoch():
            yield collate(self.dataset, indices)

    def epoch(self, rng_key, prefetch_size: int = 2
              ) -> Iterator[Dict[str, jax.Array]]:
        """Device-ready batches.  Host collation is prefetched on a
        background thread; ALL jax dispatch happens on the caller's thread
        (dispatching from a second thread deadlocks on some experimental
        backends, e.g. the axon TPU tunnel)."""
        if self.device_cache:
            img_all, lbl_all = self._device_dataset()
            for indices in self.sampler.epoch():
                rng_key, sub = jax.random.split(rng_key)
                idx = jax.numpy.asarray(indices.astype(np.int32))
                batch = self.pipeline_idx(sub, img_all, lbl_all, idx)
                if self.sharding is not None:
                    batch = jax.device_put(batch, self.sharding)
                yield batch
            return
        raw_it = self.raw_epoch()
        if prefetch_size:
            raw_it = prefetch(raw_it, prefetch_size)
        for raw in raw_it:
            rng_key, sub = jax.random.split(rng_key)
            img = jax.numpy.asarray(raw["image"])
            # class ids fit uint8: 4x smaller host->device transfer over the
            # tunnel; the fused pipeline casts back to int32 on device.
            lbl = jax.numpy.asarray(raw["label"].astype(np.uint8))
            # one dispatch for augment + keep_orig concat (per-op dispatch
            # over the tunneled backend is an RPC round trip each)
            batch = self.pipeline(sub, img, lbl)
            if self.sharding is not None:
                batch = jax.device_put(batch, self.sharding)
            yield batch


class EvalBatcher:
    """Validation batches: eval transform only (no augmentation).

    Tail batches are PADDED (wrap-tiled) up to ``batch_size`` and carry a
    ``'real_count'`` int so consumers mask the pad rows out of metric
    updates: no sample is double-counted, the jitted predict never sees a
    ragged shape (one compile), and — under a data-parallel ``sharding`` —
    every batch divides over the mesh instead of the tail failing to shard
    or running on one device while the rest idle."""

    def __init__(self, dataset: SegDatasetBase, batch_size: int,
                 pad_hw=(224, 224), crop_hw=(192, 192), sharding=None,
                 device_cache: Optional[bool] = None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.sampler = BatchSampler(len(dataset), batch_size, shuffle=False,
                                    wrap=False)
        self.eval_transform = make_batch_eval_transform(pad_hw, crop_hw)
        self.sharding = sharding
        if sharding is not None:
            n_dev = sharding.mesh.size
            assert batch_size % n_dev == 0, (
                f"eval batch_size {batch_size} must divide over the "
                f"{n_dev}-device mesh")
        if device_cache is None:
            est = len(dataset) * crop_hw[0] * crop_hw[1] * 8
            device_cache = est <= DEVICE_CACHE_LIMIT_BYTES
        self.device_cache = device_cache
        self._cached_batches = None

    def __len__(self) -> int:
        return len(self.sampler)

    def _build_epoch(self):
        from cooperative_training_and_latent_space_data_augmentation_tpu.parallel.mesh import (
            pad_batch_to_multiple,
        )

        for indices in self.sampler.epoch():
            raw = collate(self.dataset, indices)
            raw, real_count = pad_batch_to_multiple(raw, self.batch_size)
            img, lbl = self.eval_transform(
                jax.numpy.asarray(raw["image"]), jax.numpy.asarray(raw["label"]))
            batch = {"image": img, "label": lbl}
            if self.sharding is not None:
                batch = jax.device_put(batch, self.sharding)
            batch["real_count"] = real_count  # plain int; added post-device_put
            yield batch

    def stacked_epoch(self):
        """The whole deterministic validation epoch as stacked device
        arrays: (imgs (Nb, B, H, W, 1), lbls (Nb, B, H, W) int32,
        real_counts (Nb,) int32) — the input format of the K-epoch fused
        window (train/multi_epoch.py), whose on-device eval scan masks the
        wrap-padded tail rows via real_counts."""
        imgs, lbls, reals = [], [], []
        for batch in self.epoch():
            imgs.append(batch["image"])
            lbls.append(jax.numpy.asarray(batch["label"], jax.numpy.int32))
            reals.append(batch["real_count"])
        return (jax.numpy.stack(imgs), jax.numpy.stack(lbls),
                jax.numpy.asarray(np.asarray(reals, np.int32)))

    def epoch(self) -> Iterator[Dict[str, jax.Array]]:
        # The eval transform is deterministic, so the device-side batches
        # are identical every epoch: cache them on device after the first
        # pass and re-yield (validation then costs ZERO host->device
        # transfer per epoch — it runs every epoch for model selection,
        # train...py:249-255).
        if not self.device_cache:
            yield from self._build_epoch()
            return
        if self._cached_batches is None:
            cached = []
            for batch in self._build_epoch():
                cached.append(batch)
                yield batch
            self._cached_batches = cached
        else:
            yield from self._cached_batches
