"""Batching + tokenizing loader feeding device-ready numpy batches.

Replaces the reference's torch DataLoader + in-loop host tokenization
(train_StorySalon_stage2.py:207-213,267,277-280) with a background-threaded
numpy loader: images decode and captions tokenize on host while the TPU
runs the previous step, then the whole batch device_puts in one transfer.
"""
from __future__ import annotations

import queue
import threading
from typing import Callable, Dict, Iterator, Optional, Sequence

import numpy as np


class Tokenizer:
    """Thin wrapper over a CLIP BPE tokenizer producing fixed 77-token ids.

    Uses transformers' CLIPTokenizer(Fast) vocab/merges from a checkpoint
    folder (the reference tokenizes identically,
    train_StorySalon_stage2.py:267)."""

    def __init__(self, path: str, max_length: int = 77):
        from transformers import CLIPTokenizer, CLIPTokenizerFast
        try:
            self.tok = CLIPTokenizerFast.from_pretrained(path)
        except Exception:
            self.tok = CLIPTokenizer.from_pretrained(path)
        self.max_length = max_length

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        out = self.tok(list(texts), padding="max_length",
                       max_length=self.max_length, truncation=True,
                       return_tensors="np")
        return out["input_ids"].astype(np.int32)


def collate(samples: Sequence[Dict],
            tokenizer: Optional[Callable] = None) -> Dict[str, np.ndarray]:
    """Stack per-sample dicts into batch arrays.

    ref_images stacks to (N_refs, B, H, W, 3) — the ref-major layout the
    training step consumes. Prompts tokenize to input_ids/(N,B,77)
    ref_input_ids when a tokenizer is given, else pass through as lists.
    """
    out: Dict[str, np.ndarray] = {}
    keys = samples[0].keys()
    if "image" in keys:
        out["image"] = np.stack([s["image"] for s in samples])
    if "mask" in keys:
        out["mask"] = np.stack([s["mask"] for s in samples])
    # precomputed-latent samples (data/datasets.py PrecomputedLatentDataset)
    # arrive pre-tokenized with VAE posterior moments instead of pixels
    if "latent_moments" in keys:
        out["latent_moments"] = np.stack(
            [s["latent_moments"] for s in samples])
    if "ref_latent_moments" in keys:
        out["ref_latent_moments"] = np.stack(
            [s["ref_latent_moments"] for s in samples], axis=1)
    if "input_ids" in keys:
        out["input_ids"] = np.stack(
            [s["input_ids"] for s in samples]).astype(np.int32)
    if "ref_input_ids" in keys:
        out["ref_input_ids"] = np.stack(
            [s["ref_input_ids"] for s in samples],
            axis=1).astype(np.int32)
    if "ref_images" in keys:
        out["ref_images"] = np.stack(
            [s["ref_images"] for s in samples], axis=1)
    if "prompt" in keys:
        prompts = [s["prompt"] for s in samples]
        if tokenizer is not None:
            out["input_ids"] = tokenizer(prompts)
        else:
            out["prompt"] = prompts
    if "ref_prompts" in keys:
        n = len(samples[0]["ref_prompts"])
        if tokenizer is not None:
            out["ref_input_ids"] = np.stack(
                [tokenizer([s["ref_prompts"][i] for s in samples])
                 for i in range(n)])
        else:
            out["ref_prompts"] = [s["ref_prompts"] for s in samples]
    return out


class DataLoader:
    """Shuffling, epoch-cycling, prefetching batch iterator."""

    def __init__(self, dataset, batch_size: int,
                 tokenizer: Optional[Callable] = None,
                 shuffle: bool = True, seed: int = 0,
                 drop_last: bool = True, prefetch: int = 2,
                 num_threads: int = 4,
                 num_shards: int = 1, shard_id: int = 0):
        """num_shards/shard_id: multi-process data sharding — each
        process reads every num_shards-th sample of the (identically
        seeded) shuffled epoch, DistributedSampler-style, so the union of
        all processes' batches is the global batch with no overlap
        (parallel/multihost.py; batch_size here is the PER-PROCESS
        size)."""
        assert 0 <= shard_id < num_shards
        self.dataset = dataset
        self.batch_size = batch_size
        self.tokenizer = tokenizer
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_threads = num_threads
        self.num_shards = num_shards
        self.shard_id = shard_id
        self._rng = np.random.RandomState(seed)

    def _epoch_indices(self) -> np.ndarray:
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            # all shards use the SAME seed stream -> same permutation;
            # the stride below then partitions it disjointly
            self._rng.shuffle(idx)
        if self.num_shards > 1:
            idx = idx[self.shard_id::self.num_shards]
        return idx

    def _batches(self, pool) -> Iterator[Dict[str, np.ndarray]]:
        epoch = 0
        while True:  # cycle epochs forever (reference data_yielder,
            # train_StorySalon_stage2.py:249-255)
            rng = getattr(self.dataset, "_rng", None)
            if hasattr(rng, "set_epoch"):
                # advance the dataset's per-item RNG epoch so CFG
                # dropout varies across epochs (datasets._PerItemRNG)
                rng.set_epoch(epoch)
            epoch += 1
            idx = self._epoch_indices()
            n_full = len(idx) // self.batch_size
            end = n_full * self.batch_size if self.drop_last else len(idx)
            for s in range(0, end, self.batch_size):
                chunk = [int(i) for i in idx[s:s + self.batch_size]]
                if pool is not None:
                    # PIL decode/resize releases the GIL: per-step host
                    # work is batch x 4 512px image decodes, which a
                    # single thread cannot feed to an 8-chip mesh
                    samples = list(pool.map(self.dataset.__getitem__, chunk))
                else:
                    samples = [self.dataset[i] for i in chunk]
                yield collate(samples, self.tokenizer)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        from concurrent.futures import ThreadPoolExecutor
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        pool = (ThreadPoolExecutor(max_workers=self.num_threads)
                if self.num_threads > 1 else None)

        def worker():
            try:
                for batch in self._batches(pool):
                    if stop.is_set():
                        return
                    q.put(batch)
            finally:
                q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                batch = q.get()
                if batch is None:
                    return
                yield batch
        finally:
            stop.set()
            if pool is not None:
                pool.shutdown(wait=False)
