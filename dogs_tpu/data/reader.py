"""Threaded image prefetch queue.

Capability parity with the reference's ImageReader/TaskQueue
(conerf/base/task_queue.py:30-152): a pool of loader threads decodes the
next epoch's images ahead of the training loop, with a blocking get and a
safe-exit drain between epochs. Image decode is host-side work that overlaps
the TPU step; 8 threads keep a v5e step fed at rubble-class resolutions.
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from dogs_tpu.data.dataset import load_image


class ImageReader:
    """Prefetches images for an ordered list of (index, path) tasks."""

    def __init__(
        self,
        image_list: list[str],
        num_channels: int = 3,
        num_threads: int = 8,
        max_prefetch: int = 16,
    ):
        self.image_list = image_list
        self.num_channels = num_channels
        self._tasks: queue.Queue = queue.Queue()
        self._results: dict[int, np.ndarray] = {}
        self._cv = threading.Condition()
        self._stop = False
        self._sem = threading.Semaphore(max_prefetch)
        for i in range(len(image_list)):
            self._tasks.put(i)
        self._threads = [
            threading.Thread(target=self._worker, daemon=True)
            for _ in range(min(num_threads, max(len(image_list), 1)))
        ]
        for t in self._threads:
            t.start()

    def _worker(self):
        while not self._stop:
            try:
                idx = self._tasks.get(timeout=0.1)
            except queue.Empty:
                return
            self._sem.acquire()
            if self._stop:
                self._sem.release()
                return
            img = load_image(self.image_list[idx], self.num_channels)
            with self._cv:
                self._results[idx] = img
                self._cv.notify_all()

    def get_image(self, idx: int) -> np.ndarray:
        """Blocking pop of a decoded image (task_queue.py:123-136)."""
        with self._cv:
            while idx not in self._results:
                self._cv.wait(timeout=5.0)
            img = self._results.pop(idx)
        self._sem.release()
        return img

    def safe_exit(self):
        """Drain threads between epochs (task_queue.py:138-152)."""
        self._stop = True
        # Unblock producers waiting on the prefetch budget.
        for _ in self._threads:
            self._sem.release()
        for t in self._threads:
            t.join(timeout=2.0)
        self._results.clear()
