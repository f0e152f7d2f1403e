"""Host data pipeline producing fixed-shape padded batches.

Replaces the reference's ``torch.utils.data.DataLoader`` worker processes +
ragged ``detection_collate`` (/root/reference/train.py:192-199,
/root/reference/data/voc0712.py:429-451). Two worker modes:

  * ``workers="thread"`` (default): a thread pool — the production route
    for the ``--device-augment`` path, whose host work (JPEG decode, cv2
    canvas resize) releases the GIL; measured 629 img/s sustained on one
    core (scripts/bench_pipeline.py).
  * ``workers="process"``: a spawn-based process pool — the reference's
    scaling model, for the host-augment *parity* pipeline whose numpy-heavy
    ``TrainAugment`` (≈13 ms/img ≈ 49 img/s/core) holds the GIL too much
    for threads to scale. Per-core rate is identical; cores multiply.

Batches are dicts of numpy arrays ready for ``jax.device_put``:

  image [B,S,S,3] f32 NHWC · boxes [B,M,4] · labels [B,M] · weights [B,M]
  · valid [B,M]

Both modes emit batches in deterministic sequence order (samples are
reordered by sequence number before collation), so the two modes produce
IDENTICAL batch streams for the same seed — the process pool is a drop-in
throughput knob, not a semantics change. Double-buffered: the next batch is
assembled while the device runs the current step.
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Optional

import numpy as np

from ct_tpu.data.targets import pad_targets
from ct_tpu.train.sampler import TrainingSampler


def _process_worker(dataset_bytes: bytes, index_q, sample_q, stop):
    """Worker-process loop: deserialize the dataset once, then map
    indices → samples. Top-level so the 'spawn' start method can import it
    (fork is unsafe here: the parent may hold JAX/tunnel RPC threads)."""
    import pickle

    try:
        import cv2

        cv2.setNumThreads(1)
    except ImportError:  # pragma: no cover
        pass
    dataset = pickle.loads(dataset_bytes)
    while not stop.is_set():
        try:
            seq, idx = index_q.get(timeout=0.2)
        except queue.Empty:
            continue
        sample = dataset[idx]
        while not stop.is_set():
            try:
                sample_q.put((seq, sample), timeout=0.2)
                break
            except queue.Full:
                continue


class Loader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        num_workers: int = 4,
        max_objs: int = 100,
        seed: Optional[int] = None,
        prefetch: int = 2,
        shuffle: bool = True,
        workers: str = "thread",
    ):
        if workers not in ("thread", "process"):
            raise ValueError(f"workers must be thread|process, got {workers}")
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self.max_objs = max_objs
        self.seed = seed
        self.prefetch = prefetch
        self.shuffle = shuffle
        self.workers = workers
        self._generation = 0
        self._procs: list = []
        self._start()

    # -- lifecycle ---------------------------------------------------------

    def _start(self):
        # OpenCV's internal parallel_for thrashes against Python worker
        # threads (measured 18 → 530 img/s on a 1-core host when pinned);
        # the reference avoids this implicitly via DataLoader *processes*
        try:
            import cv2

            cv2.setNumThreads(1)
        except ImportError:  # pragma: no cover
            pass
        # Each generation gets its own stop event + queues, and the worker
        # threads capture THEM (not self attributes): a worker that is
        # still blocked inside ``dataset[idx]`` across a restart() can only
        # ever touch its own generation's (stopped, drained) objects —
        # stale samples cannot leak into the new generation.
        qsize = self.batch_size * (self.prefetch + 1)
        self._batch_q = batch_q = queue.Queue(maxsize=self.prefetch)
        self._threads = []
        self._procs = []

        if self.workers == "process":
            import multiprocessing as mp
            import pickle

            ctx = mp.get_context("spawn")
            self._stop = stop = ctx.Event()
            self._index_q = index_q = ctx.Queue(maxsize=qsize)
            self._sample_q = sample_q = ctx.Queue(maxsize=qsize)
            payload = pickle.dumps(self.dataset)
            for _ in range(self.num_workers):
                p = ctx.Process(
                    target=_process_worker,
                    args=(payload, index_q, sample_q, stop), daemon=True,
                )
                p.start()
                self._procs.append(p)
        else:
            self._stop = stop = threading.Event()
            self._index_q = index_q = queue.Queue(maxsize=qsize)
            self._sample_q = sample_q = queue.Queue(maxsize=qsize)
            for _ in range(self.num_workers):
                t = threading.Thread(
                    target=self._work,
                    args=(stop, index_q, sample_q), daemon=True,
                )
                t.start()
                self._threads.append(t)

        t = threading.Thread(target=self._feed_indices,
                             args=(stop, index_q), daemon=True)
        t.start()
        self._threads.append(t)
        t = threading.Thread(target=self._assemble,
                             args=(stop, sample_q, batch_q), daemon=True)
        t.start()
        self._threads.append(t)

    def restart(self):
        """Tear down and rebuild workers (e.g. after toggling mixup)."""
        self.stop()
        self._generation += 1
        self._start()

    def stop(self):
        self._stop.set()
        for q in (self._index_q, self._sample_q, self._batch_q):
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
        for t in self._threads:
            t.join(timeout=2.0)
        for p in self._procs:
            p.join(timeout=5.0)
            if p.is_alive():  # pragma: no cover — stuck in dataset[idx]
                p.terminate()
                p.join(timeout=2.0)

    # -- pipeline stages ---------------------------------------------------

    def _feed_indices(self, stop, index_q):
        sampler = TrainingSampler(
            len(self.dataset), shuffle=self.shuffle,
            seed=None if self.seed is None
            else self.seed + self._generation,
        )
        seq = 0
        for idx in sampler:
            if stop.is_set():
                return
            while not stop.is_set():
                try:
                    index_q.put((seq, idx), timeout=0.2)
                    break
                except queue.Full:
                    continue
            seq += 1

    def _work(self, stop, index_q, sample_q):
        while not stop.is_set():
            try:
                seq, idx = index_q.get(timeout=0.2)
            except queue.Empty:
                continue
            sample = self.dataset[idx]
            while not stop.is_set():
                try:
                    sample_q.put((seq, sample), timeout=0.2)
                    break
                except queue.Full:
                    continue

    def _assemble(self, stop, sample_q, batch_q):
        pending: Dict[int, tuple] = {}
        next_seq = 0
        buf = []
        while not stop.is_set():
            try:
                seq, sample = sample_q.get(timeout=0.2)
            except queue.Empty:
                continue
            pending[seq] = sample
            # emit strictly in sequence order → deterministic batches
            while next_seq in pending:
                buf.append(pending.pop(next_seq))
                next_seq += 1
                if len(buf) == self.batch_size:
                    batch = self._collate(buf)
                    buf = []
                    while not stop.is_set():
                        try:
                            batch_q.put(batch, timeout=0.2)
                            break
                        except queue.Full:
                            continue

    def _collate(self, samples) -> Dict[str, np.ndarray]:
        # keep the images' native dtype: the device-augment path ships
        # uint8 canvases (4x fewer bytes); host-augment is already f32
        images = np.stack([s[0] for s in samples])
        padded = pad_targets([s[1] for s in samples], self.max_objs)
        return {
            "image": images,
            "boxes": padded.boxes,
            "labels": padded.labels,
            "weights": padded.weights,
            "valid": padded.valid,
        }

    # -- consumption -------------------------------------------------------

    def next(self) -> Dict[str, np.ndarray]:
        while True:
            try:
                return self._batch_q.get(timeout=5.0)
            except queue.Empty:
                if self._stop.is_set():
                    raise RuntimeError("Loader is stopped")

    def __iter__(self):
        while True:
            yield self.next()
