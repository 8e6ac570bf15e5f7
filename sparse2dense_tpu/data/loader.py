"""Input pipeline: dataset -> static-shape device batches.

Replaces the reference's torch DataLoader + collate_kitti + DistributedSampler
stack (det3d/torchie/parallel/collate.py:91-161, datasets/loader/sampler.py:74,
and the missing build_loader.py — see SURVEY.md header note):

- ``collate``: ragged per-frame dicts -> fixed (B, max_voxels, ...) arrays.
  The reference concatenates voxel rows across the batch and prepends a
  batch-index column to the coordinates; on TPU the batch dim stays explicit
  (B, V, ...) with -1-padded coordinates, which is what every model here
  consumes — same information, static shape.
- ``ShardedSampler``: epoch-seeded shuffle + per-host sharding (the
  DistributedSampler semantics: shard k of n sees indices k::n of the
  epoch permutation, padded to equal length).
- ``InputPipeline``: iterable over jnp batches. ``num_workers=0`` produces on
  a single prefetch thread; ``num_workers>0`` runs the per-frame pipeline in
  that many spawn-safe worker PROCESSES (the reference's workers_per_gpu
  DataLoader subprocesses) with in-order batch pickup. Device placement
  always happens in the main process (workers stay jax-free).
"""
from __future__ import annotations

import multiprocessing as _mp
import pickle
import threading
import queue as _queue
from typing import Iterator, Optional

import numpy as np

VOXEL_STREAM_PREFIXES = ("", "dense_", "reconstruction_")
VOXEL_STREAM_TAGS = ("", "_2", "_4")


def _pad_rows(a: np.ndarray, n: int, fill=0):
    out = np.full((n,) + a.shape[1:], fill, a.dtype)
    m = min(len(a), n)
    out[:m] = a[:m]
    return out


def _voxel_keys(example):
    keys = []
    for prefix in VOXEL_STREAM_PREFIXES:
        tags = VOXEL_STREAM_TAGS if prefix == "reconstruction_" else ("",)
        for tag in tags:
            base = f"{prefix}voxels{tag}"
            if base in example:
                keys.append((f"{prefix}voxels{tag}",
                             f"{prefix}coordinates{tag}",
                             f"{prefix}num_points{tag}"))
    return keys


def collate(examples, max_voxels: int):
    """List of per-frame dicts -> one static-shape batch dict (NumPy).
    Double-flip frames arrive as 4-bundle lists and are flattened so the
    batch stays grouped [orig, yflip, xflip, double] x frames."""
    flat = []
    for e in examples:
        flat.extend(e) if isinstance(e, list) else flat.append(e)
    examples = flat
    batch = {}
    ex0 = examples[0]
    for vk, ck, nk in _voxel_keys(ex0):
        batch[vk] = np.stack([_pad_rows(e[vk], max_voxels) for e in examples])
        batch[ck] = np.stack(
            [_pad_rows(e[ck].astype(np.int32), max_voxels, fill=-1)
             for e in examples]
        )
        batch[nk] = np.stack(
            [_pad_rows(e[nk].astype(np.int32), max_voxels) for e in examples]
        )
    for key in ("hm", "anno_box", "ind", "mask", "cat",
                "labels", "reg_targets", "reg_weights", "anchors"):
        if key in ex0:
            n_tasks = len(ex0[key])
            batch[key] = [
                np.stack([np.asarray(e[key][t]) for e in examples])
                for t in range(n_tasks)
            ]
            if key in ("ind", "cat", "labels"):
                batch[key] = [x.astype(np.int32) for x in batch[key]]
    if "gt_boxes_and_cls" in ex0:
        batch["gt_boxes_and_cls"] = np.stack(
            [e["gt_boxes_and_cls"] for e in examples]
        )
    batch["metadata"] = [e.get("metadata") for e in examples]
    return batch


class ShardedSampler:
    """Epoch-seeded permutation, sharded across hosts
    (reference datasets/loader/sampler.py:74-96)."""

    def __init__(self, n: int, shuffle=True, seed=0, num_shards=1, shard_id=0,
                 drop_last=True):
        self.n = n
        self.shuffle = shuffle
        self.seed = seed
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.drop_last = drop_last

    def epoch_indices(self, epoch: int) -> np.ndarray:
        if self.shuffle:
            rng = np.random.RandomState(self.seed + epoch)
            idx = rng.permutation(self.n)
        else:
            idx = np.arange(self.n)
        per_shard = self.n // self.num_shards if self.drop_last else -(-self.n // self.num_shards)
        if not self.drop_last:  # pad by wrapping
            pad = per_shard * self.num_shards - self.n
            idx = np.concatenate([idx, idx[:pad]])
        return idx[self.shard_id::self.num_shards][:per_shard]


def _worker_main(dataset_pkl: bytes, max_voxels: int, in_q, out_q):
    """Worker-process loop: indices chunk -> collated NumPy batch.

    The dataset arrives as explicit pickle bytes so this function body (not
    argument deserialization) controls import order; the data layer has no
    module-level jax imports, so workers never touch a device backend.
    """
    import os

    os.environ.setdefault("JAX_PLATFORMS", "cpu")  # belt & braces
    dataset = pickle.loads(dataset_pkl)
    while True:
        item = in_q.get()
        if item is None:
            break
        batch_id, indices = item
        try:
            examples = [dataset[int(i)] for i in indices]
            out_q.put((batch_id, collate(examples, max_voxels), None))
        except Exception as e:  # surface worker crashes to the main process
            out_q.put((batch_id, None, repr(e)))


class InputPipeline:
    """Iterable over device-ready batches."""

    def __init__(self, dataset, batch_size: int, max_voxels: int,
                 shuffle=True, seed=0, num_shards=1, shard_id=0,
                 prefetch: int = 2, to_device=True, num_workers: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.max_voxels = max_voxels
        self.sampler = ShardedSampler(
            len(dataset), shuffle=shuffle, seed=seed,
            num_shards=num_shards, shard_id=shard_id,
        )
        self.prefetch = prefetch
        self.to_device = to_device
        self.num_workers = num_workers
        self.epoch = 0

    def __len__(self):
        return len(self.sampler.epoch_indices(0)) // self.batch_size

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def _produce(self) -> Iterator[dict]:
        idx = self.sampler.epoch_indices(self.epoch)
        nb = len(idx) // self.batch_size
        for b in range(nb):
            chunk = idx[b * self.batch_size:(b + 1) * self.batch_size]
            examples = [self.dataset[int(i)] for i in chunk]
            yield collate(examples, self.max_voxels)

    def _produce_mp(self) -> Iterator[dict]:
        """Multi-process production with in-order pickup (the reference's
        workers_per_gpu DataLoader; SURVEY.md §3.1 dataloader-worker boundary)."""
        idx = self.sampler.epoch_indices(self.epoch)
        nb = len(idx) // self.batch_size
        ctx = _mp.get_context("spawn")
        in_q = ctx.Queue(maxsize=2 * self.num_workers)
        out_q = ctx.Queue(maxsize=max(2, self.prefetch) * self.num_workers)
        dataset_pkl = pickle.dumps(self.dataset)
        procs = [
            ctx.Process(target=_worker_main,
                        args=(dataset_pkl, self.max_voxels, in_q, out_q),
                        daemon=True)
            for _ in range(self.num_workers)
        ]
        for p in procs:
            p.start()

        def feeder():
            for b in range(nb):
                in_q.put((b, idx[b * self.batch_size:(b + 1) * self.batch_size]))
            for _ in procs:
                in_q.put(None)

        threading.Thread(target=feeder, daemon=True).start()
        try:
            buffered, expect = {}, 0
            for _ in range(nb):
                while expect not in buffered:
                    batch_id, batch, err = out_q.get()
                    if err is not None:
                        raise RuntimeError(f"input worker failed on batch "
                                           f"{batch_id}: {err}")
                    buffered[batch_id] = batch
                yield buffered.pop(expect)
                expect += 1
        finally:
            for p in procs:
                p.terminate()
            for p in procs:
                p.join(timeout=5)

    def __iter__(self) -> Iterator[dict]:
        if self.num_workers > 0:
            yield from map(self._finalize, self._produce_mp())
            return
        if self.prefetch <= 0:
            yield from map(self._finalize, self._produce())
            return
        q: _queue.Queue = _queue.Queue(maxsize=self.prefetch)
        done = object()

        def worker():
            try:
                for item in self._produce():
                    q.put(item)
            finally:
                q.put(done)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is done:
                break
            yield self._finalize(item)

    def _finalize(self, batch):
        if not self.to_device:
            return batch
        import jax.numpy as jnp

        out = {}
        for k, v in batch.items():
            if k == "metadata":
                out[k] = v
            elif isinstance(v, list):
                out[k] = [jnp.asarray(x) for x in v]
            else:
                out[k] = jnp.asarray(v)
        return out


def build_dataset(cfg, distillation=None):
    """Dataset from the reference config schema (data.train/val/test dicts)."""
    from .datasets.waymo import WaymoDataset
    from .datasets.nuscenes import NuScenesDataset
    from .pipelines.formating import build_pipeline

    cfg = dict(cfg)
    kind = cfg.pop("type")
    pipeline = build_pipeline(cfg.pop("pipeline"), distillation=distillation)
    registry = {"WaymoDataset": WaymoDataset, "NuScenesDataset": NuScenesDataset}
    cfg.pop("ann_file", None)
    return registry[kind](pipeline=pipeline, **cfg)
