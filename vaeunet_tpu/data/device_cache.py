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


class StreamingStager:
    """Bounded-lifetime H2D staging for host-fed batches (the fallback when
    a dataset exceeds ``device_cache_max_bytes``).

    The naive per-step ``jnp.asarray(batch)`` feed leaks host RSS on
    tunneled TPU backends (~86 MB/step measured at scale 1.0, RESULTS.md
    round 2): every transfer leaves a client-side staging buffer whose
    release waits on Python GC of the ``jax.Array`` handle, and the async
    dispatch queue keeps whole chains of them reachable.  This stager gives
    each step's inputs an explicit two-step lifetime instead: arrays staged
    at step N are ``delete()``d when step N+2 is staged (N+1's dispatch has
    then been enqueued, so the runtime has retired N's execution or holds
    its own reference — the runtime keeps donated/in-flight buffers alive
    independently of the Python handle), and a periodic ``gc.collect()``
    sweeps the cyclic tracker/aux structures the handles hang off.

    No reference counterpart — torch DataLoader pins and frees per batch
    (reference train.py:239-259); this is the JAX-client analogue.
    """

    def __init__(self, depth: int = 2, gc_every: int = 64):
        self._rings: list = [[] for _ in range(max(1, depth))]
        self._gc_every = gc_every
        self._n = 0

    @staticmethod
    def _retire(a) -> None:
        # Only a donated/already-deleted buffer is expected here; any other
        # failure means the staging contract is broken and must be heard
        # (ADVICE r3: a bare except also hid real backend errors).
        if not a.is_deleted():
            a.delete()

    def stage(self, *host_arrays):
        retire = self._rings.pop(0)
        for a in retire:
            self._retire(a)
        staged = [jnp.asarray(a) for a in host_arrays]
        self._rings.append(list(staged))
        self._n += 1
        if self._gc_every and self._n % self._gc_every == 0:
            import gc

            gc.collect()
        return staged

    def close(self):
        # Continue the sweep on per-buffer failure and re-raise the first
        # error only after every ring is cleared: close() runs in
        # train_model's finally block, where aborting mid-sweep would both
        # leak the remaining buffers and mask the original training
        # exception (ADVICE r4).  stage() keeps strict propagation — there
        # the staging contract is load-bearing.
        first_err = None
        for ring in self._rings:
            for a in ring:
                try:
                    self._retire(a)
                except Exception as e:  # noqa: BLE001
                    if first_err is None:
                        first_err = e
            ring.clear()
        if first_err is not None:
            raise first_err


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
                mp = mask_u8[y:y + p, x:x + p]
                masks[i] = mp if mp.ndim == 3 else mp[..., None]
                ids[i] = img_id
        return True

    def __len__(self) -> int:
        return self.images.shape[0]

    def batch_indices(self, idx) -> np.ndarray:
        """Loader sample indices are the gather indices in patch layout."""
        return np.asarray(idx, np.int32)

    def make_gather(self):
        return gather_batch_device

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


def gather_patch_records_device(data_images, data_masks, rec, patch_size: int):
    """On-device patch extraction from whole-image arrays (inside jit).

    rec: [B, 3] int32 rows of (image_index, y, x).
    data_images: [N_img, H, W, 3] u8, data_masks: [N_img, H, W] u8.
    -> (images [B,P,P,3] f32 in [0,1], masks [B,P,P,1] f32).

    Each row lowers to one 4D ``lax.dynamic_slice`` on the stacked array —
    XLA reads exactly the patch bytes from HBM; no whole-image gather and no
    per-patch host traffic.  This is what lets 50%-overlap patch grids and
    oversampling replicas (dataset.py:_finalize_index) cost zero extra HBM:
    the cache stores each source image once.
    """
    p = patch_size
    mask_channels = data_masks.ndim == 4  # multi-lesion [N,H,W,C] layout

    def one(r):
        img = jax.lax.dynamic_slice(
            data_images, (r[0], r[1], r[2], jnp.int32(0)),
            (1, p, p, data_images.shape[-1]))[0]
        if mask_channels:
            msk = jax.lax.dynamic_slice(
                data_masks, (r[0], r[1], r[2], jnp.int32(0)),
                (1, p, p, data_masks.shape[-1]))[0]
        else:
            msk = jax.lax.dynamic_slice(
                data_masks, (r[0], r[1], r[2]), (1, p, p))[0]
        return img, msk

    images, masks = jax.vmap(one)(rec.astype(jnp.int32))
    masks = masks.astype(jnp.float32)
    return (images.astype(jnp.float32) / 255.0,
            masks if mask_channels else masks[..., None])


def estimate_image_bytes(dataset) -> Optional[int]:
    """uint8 HBM footprint of ``ImageDeviceCache`` for `dataset`, or None
    when the dataset doesn't support the whole-image layout (full-image
    mode, float cache, or no patch index)."""
    index = getattr(dataset, "patch_index", None)
    meta = getattr(dataset, "meta", None)
    if (index is None or meta is None
            or getattr(dataset, "is_full_image", True)):
        return None
    ids = {r[0] for r in index}
    if not ids:
        return 0
    h = max(meta[i]["h"] for i in ids)
    w = max(meta[i]["w"] for i in ids)
    c = len(getattr(dataset, "mask_channels", (0,)))  # mask planes
    return len(ids) * h * w * (3 + c)  # 3 image planes + mask planes


class ImageDeviceCache:
    """Whole-image device-resident dataset: patches are cut on-device.

    Stores each *source image* once — [N_img, H, W, 3] u8 + [N_img, H, W] u8
    masks, padded to the max image size — and a host-side record table
    (image_index, y, x) mirroring ``dataset.patch_index``.  Batches carry
    [B, 3] record rows; the compiled step slices the patches out of HBM
    (gather_patch_records_device).

    Compared to the patch-level DeviceCache this removes the 50%-overlap
    4x storage redundancy and makes oversampling replicas free, which is
    what keeps scale-1.0 IDRiD (6+ GB as patches) inside the HBM budget.
    The alternative — host-fed batches — leaks client-side transfer
    staging on the tunneled TPU backend (~86 MB/step measured, host-OOM
    after ~1.5k steps), so fitting in HBM is a correctness property here,
    not just a throughput one.
    """

    is_image_level = True

    def __init__(self, dataset, device=None):
        index = getattr(dataset, "patch_index", None)
        raw = getattr(dataset, "_image_arrays_u8", None)
        if index is None or raw is None or getattr(
                dataset, "is_full_image", True):
            raise ValueError("dataset does not support ImageDeviceCache")
        self.patch_size = int(dataset.patch_size)
        ids = sorted({r[0] for r in index})
        id_to_pos = {img_id: i for i, img_id in enumerate(ids)}
        h = max(dataset.meta[i]["h"] for i in ids)
        w = max(dataset.meta[i]["w"] for i in ids)
        c = len(getattr(dataset, "mask_channels", (0,)))
        images = np.zeros((len(ids), h, w, 3), np.uint8)
        masks = np.zeros((len(ids), h, w) + ((c,) if c > 1 else ()), np.uint8)
        for img_id in ids:
            arrs = raw(img_id)
            if arrs is None:
                raise ValueError(f"no uint8 planes for {img_id}")
            img_u8, mask_u8 = arrs
            ih, iw = img_u8.shape[:2]
            images[id_to_pos[img_id], :ih, :iw] = img_u8
            masks[id_to_pos[img_id], :ih, :iw] = (
                mask_u8 if mask_u8.ndim == masks.ndim - 1
                else np.squeeze(mask_u8))
        self.records = np.asarray(
            [(id_to_pos[i], y, x) for i, y, x, _ in index], np.int32)
        self.img_ids = [index[i][0] for i in range(len(index))]

        d = device or jax.devices()[0]
        log.info("ImageDeviceCache: uploading %d images (%.0f MB uint8, "
                 "%d patch records) to %s",
                 len(ids), (images.nbytes + masks.nbytes) / 1e6,
                 len(index), d)
        self.images = jax.device_put(images, d)
        self.masks = jax.device_put(masks, d)

    def __len__(self) -> int:
        return len(self.records)

    def batch_indices(self, idx) -> np.ndarray:
        """Translate loader sample indices -> [B, 3] device-gather records."""
        return self.records[np.asarray(idx)]

    def make_gather(self):
        p = self.patch_size

        def gather(data_images, data_masks, rec):
            return gather_patch_records_device(data_images, data_masks,
                                               rec, p)
        return gather

    def fetch(self, idx) -> Tuple[np.ndarray, np.ndarray]:
        """Host copies of selected samples (float image, float mask [P,P,1])
        — visualization only."""
        rec = self.records[np.asarray(idx)]
        p = self.patch_size
        imgs, msks = [], []
        for i, y, x in rec:
            img = np.asarray(self.images[i, y:y + p, x:x + p])
            msk = np.asarray(self.masks[i, y:y + p, x:x + p]).astype(np.float32)
            imgs.append(img.astype(np.float32) / 255.0)
            msks.append(msk if msk.ndim == 3 else msk[..., None])
        return np.stack(imgs), np.stack(msks)
