"""Device-resident dataset: the whole patch set lives in HBM.

TPU-first replacement for the reference's DataLoader feed (train.py:239-259)
on this class of dataset: IDRiD at train scale is well under HBM size
(~1 GB as uint8 at scale 0.5 / patch 512), so instead of streaming 4 GB of
fp32 batches over PCIe/tunnel per epoch, all patches are uploaded ONCE as
uint8 and every batch is gathered, normalized, and augmented on-device
inside the compiled train step.

Measured on the tunneled v5e: the host-fed epoch is ~156 s (92 s of which is
host->device copies, 15 s host collate, 49 s compute); device-resident
epochs are compute-bound.

The uint8 -> float32 /255 conversion happens on-device and is bit-identical
to the host path (dataset.py stores the same uint8 PIL pixels).
"""

from __future__ import annotations

import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger(__name__)


def estimate_bytes(dataset) -> int:
    """uint8 HBM footprint of caching `dataset` on device (images + masks)."""
    if len(dataset) == 0:
        return 0
    s = dataset[0]
    per = int(np.prod(s["image"].shape)) + int(np.prod(s["mask"].shape))
    return per * len(dataset)


class DeviceCache:
    """Stacks every sample of a patch-mode dataset into two device arrays.

    images: [N, P, P, 3] uint8, masks: [N, P, P, 1] uint8 (binary).
    Batches are formed on-device by the indexed train/eval steps
    (training.step.make_train_step(indexed=True)) via jnp.take.
    """

    def __init__(self, dataset, device=None):
        n = len(dataset)
        if n == 0:
            raise ValueError("empty dataset")
        first = dataset[0]
        p = first["image"].shape[0]
        images = np.empty((n, *first["image"].shape), np.uint8)
        masks = np.empty((n, *first["mask"].shape), np.uint8)
        ids: list = [None] * n
        if not self._fast_fill(dataset, images, masks, ids, p):
            for i in range(n):
                s = dataset[i]
                img = s["image"]
                if img.dtype != np.uint8:
                    # host path serves float [0,1]; recover exact uint8 pixels
                    img = np.round(img * 255.0).astype(np.uint8)
                images[i] = img
                masks[i] = (s["mask"] > 0.5).astype(np.uint8)
                ids[i] = s["img_id"]
        self.img_ids = ids
        self.patch_size = p

        d = device or jax.devices()[0]
        log.info("DeviceCache: uploading %d patches (%.0f MB uint8) to %s",
                 n, (images.nbytes + masks.nbytes) / 1e6, d)
        self.images = jax.device_put(images, d)
        self.masks = jax.device_put(masks, d)

    @staticmethod
    def _fast_fill(dataset, images, masks, ids, p) -> bool:
        """Image-major uint8 assembly for IDRIDDataset-style patch sets.

        The generic per-sample path is pathological after train balancing:
        negatives are shuffled, so consecutive samples hit different source
        images and each miss decompresses + float-converts a whole image
        (~25 min at scale 1.0).  Here patches are grouped by source image,
        each image's uint8 planes are loaded exactly once, and slices are
        copied directly — seconds instead of minutes.
        """
        index = getattr(dataset, "patch_index", None)
        raw = getattr(dataset, "_image_arrays_u8", None)
        if index is None or raw is None or getattr(dataset, "is_full_image",
                                                   True):
            return False
        by_img: dict = {}
        for i, (img_id, y, x, _) in enumerate(index):
            by_img.setdefault(img_id, []).append((i, y, x))
        for img_id, entries in by_img.items():
            arrs = raw(img_id)
            if arrs is None:
                return False
            img_u8, mask_u8 = arrs
            for i, y, x in entries:
                images[i] = img_u8[y:y + p, x:x + p]
                masks[i] = mask_u8[y:y + p, x:x + p, None]
                ids[i] = img_id
        return True

    def __len__(self) -> int:
        return self.images.shape[0]

    def fetch(self, idx) -> Tuple[np.ndarray, np.ndarray]:
        """Host copies of selected samples (float [0,1] image, float mask) —
        for visualization only; the hot path never does this."""
        idx = np.asarray(idx)
        img = np.asarray(self.images[idx]).astype(np.float32) / 255.0
        msk = np.asarray(self.masks[idx]).astype(np.float32)
        return img, msk


def gather_batch_device(data_images, data_masks, idx):
    """On-device batch gather + dtype normalization (inside jit).

    idx: [B] int32. -> (images [B,P,P,3] f32 in [0,1], masks [B,P,P,1] f32).
    """
    images = jnp.take(data_images, idx, axis=0).astype(jnp.float32) / 255.0
    masks = jnp.take(data_masks, idx, axis=0).astype(jnp.float32)
    return images, masks
