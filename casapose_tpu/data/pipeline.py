"""Host batch pipeline: decode, warp, crop, resize, augment, prefetch.

Replaces the reference's tf.data graph (vectorfield_dataset.py:763-1003)
with a thread-pooled numpy pipeline that keeps an accelerator fed:

  sample indices -> [pool] decode (PIL) + affine warp + crop + resize (cv2)
                 -> photometric augmentation (augment.py, optional)
                 -> batch assembly -> bounded prefetch queue

Device-side finishing (one-hot masks, label remap to one-hot, image
normalization (x/255 - 0.5)/0.5, gaussian noise, color jitter when imgaug
is off) lives in :func:`prepare_device_batch`, a pure jit-able function the
train/eval steps call — keeping the heavy elementwise work on the TPU.

The emitted batch dict mirrors the reference's 13-tensor tuple (SURVEY
§2.3); ``as_reference_tuple`` converts when tuple order matters.
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from PIL import Image

from casapose_tpu.data.augment import augment_image


def _decode_image(path, color):
    # cv2 releases the GIL during decode, so the worker threads actually
    # parallelize (PIL holds it: 8 threads decode at ~1x single-thread).
    if cv2 is not None:
        flag = cv2.IMREAD_COLOR if color else cv2.IMREAD_GRAYSCALE
        img = cv2.imread(path, flag)
        if img is not None:
            if color:
                return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            return img[..., None]
    img = Image.open(path)
    if color:
        img = img.convert("RGB")
        return np.asarray(img, np.uint8)
    img = img.convert("L")
    return np.asarray(img, np.uint8)[..., None]


def _decode_seg(path):
    if cv2 is not None:
        arr = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        # Only trust the cv2 fast path for single-channel masks: cv2
        # expands palette PNGs to BGR (losing the palette index = class id)
        # and returns BGR for color masks, so channel 0 would be BLUE where
        # the PIL path reads R/palette indices. Multi-channel falls back.
        if arr is not None and arr.ndim == 2:
            return arr.astype(np.uint8)
    seg = Image.open(path)
    arr = np.asarray(seg)
    if arr.ndim == 3:
        arr = arr[..., 0]
    return arr.astype(np.uint8)


def _warp_crop_resize(img, seg, meta, imagesize, color):
    """Affine warp (dst->src convention, = tfa.image.transform), crop, resize."""
    off = meta["offsets"]
    h_crop, w_crop, out_h, out_w = int(off[0]), int(off[1]), int(off[2]), int(off[3])
    affine = meta["affine"]
    identity = abs(off[4]) < 1e-6 and abs(off[5]) < 1e-6 and abs(off[6]) < 1e-6
    if not identity and cv2 is not None:
        h, w = img.shape[:2]
        img = cv2.warpAffine(img, affine[:2], (w, h), flags=cv2.INTER_LINEAR | cv2.WARP_INVERSE_MAP)
        if img.ndim == 2:
            img = img[..., None]
        seg = cv2.warpAffine(seg, affine[:2], (w, h), flags=cv2.INTER_NEAREST | cv2.WARP_INVERSE_MAP)
    img = img[h_crop : h_crop + out_h, w_crop : w_crop + out_w]
    seg = seg[h_crop : h_crop + out_h, w_crop : w_crop + out_w]
    if (out_h, out_w) != tuple(imagesize):
        if cv2 is not None:
            img = cv2.resize(img, (imagesize[1], imagesize[0]), interpolation=cv2.INTER_LINEAR)
            if img.ndim == 2:
                img = img[..., None]
            seg = cv2.resize(seg, (imagesize[1], imagesize[0]), interpolation=cv2.INTER_NEAREST)
        else:
            yi = (np.arange(imagesize[0]) * out_h / imagesize[0]).astype(int)
            xi = (np.arange(imagesize[1]) * out_w / imagesize[1]).astype(int)
            img = img[yi][:, xi]
            seg = seg[yi][:, xi]
    return img, seg


class RecordCache:
    """Pre-decoded frame cache: one uint8 ``.npy`` per frame (img ++ seg).

    PNG decode dominates the host loader's per-sample cost (SURVEY §7
    "preprocessed record format"); after the first epoch each frame is a
    single contiguous ~1.2 MB read that the OS page cache serves from RAM.
    Entries are keyed by (size, mtime) of BOTH source files, so editing a
    dataset invalidates exactly the touched frames. Writes are atomic
    (tmp + rename) so concurrent workers can share a cache directory.
    """

    def __init__(self, cache_dir):
        import os

        self.dir = cache_dir
        os.makedirs(cache_dir, exist_ok=True)

    def _key(self, index, img_path, seg_path, params):
        import hashlib
        import os

        st_i = os.stat(img_path)
        st_s = os.stat(seg_path)
        h = hashlib.sha1(
            f"{img_path}|{params}|{st_i.st_size}|{st_i.st_mtime_ns}|{st_s.st_size}|{st_s.st_mtime_ns}".encode()
        ).hexdigest()[:12]
        return os.path.join(self.dir, f"{index:07d}_{h}.npy")

    def get(self, index, img_path, seg_path, decode, params=""):
        """Return (img, seg); ``decode()`` supplies them on a cache miss.

        ``params`` must encode every decode option that changes the stored
        bytes (e.g. the color/grayscale flag) so option changes re-decode
        instead of serving a stale layout.
        """
        import glob
        import os
        import tempfile

        path = self._key(index, img_path, seg_path, params)
        if os.path.exists(path):
            try:
                arr = np.load(path)
                return np.ascontiguousarray(arr[..., :-1]), np.ascontiguousarray(arr[..., -1])
            except Exception:
                pass  # corrupt entry: fall through to re-decode
        img, seg = decode()
        arr = np.concatenate([img, seg[..., None]], axis=-1)
        # drop superseded entries for this frame (old mtime/params keys) so
        # the cache holds at most one record per frame
        for stale in glob.glob(os.path.join(self.dir, f"{index:07d}_*.npy")):
            try:
                os.unlink(stale)
            except OSError:
                pass
        fd, tmp = tempfile.mkstemp(dir=self.dir, suffix=".npy.tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                np.save(f, arr)
            os.replace(tmp, path)
        except OSError:
            try:
                os.unlink(tmp)
            except OSError:
                pass
        return img, seg


def _remap_labels(seg, new_labels):
    """Raw segmentation ids -> contiguous object indices (0 = background)."""
    out = np.zeros_like(seg)
    for src, dst in new_labels:
        if dst != 0:
            out[seg == src] = dst
    return out


class BatchIterator:
    """Infinite epoch-aware iterator with a bounded prefetch queue."""

    def __init__(self, dataset, indices_per_epoch, batchsize, imagesize, cropratio, max_count, workers, prefetch,
                 shuffle, seed, record_cache=None, drop_remainder=True):
        self.dataset = dataset
        self.record_cache = record_cache
        self.indices = indices_per_epoch
        self.batchsize = batchsize
        self.drop_remainder = drop_remainder
        self.imagesize = imagesize
        self.cropratio = cropratio
        self.max_count = max_count
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.workers = max(workers, 1)
        self.pool = ThreadPoolExecutor(max_workers=self.workers)
        self.queue = queue.Queue(maxsize=max(prefetch, 2))
        self._stop = False
        self._img_size_orig = None
        self.producer = threading.Thread(target=self._produce, daemon=True)
        self.producer.start()

    def _sample(self, index, seed):
        ds = self.dataset
        rng = np.random.default_rng(seed)
        path, name, txt, seg_path, path_raw = ds.imgs[index]
        if self.record_cache is not None:
            img, seg = self.record_cache.get(
                index, path, seg_path,
                lambda: (_decode_image(path, ds.color_input), _decode_seg(seg_path)),
                params=f"color={int(bool(ds.color_input))}",
            )
        else:
            img = _decode_image(path, ds.color_input)
            seg = _decode_seg(seg_path)
        if self._img_size_orig is None:
            self._img_size_orig = (img.shape[1], img.shape[0])
        meta = ds.preprocess_sample(
            index, self.imagesize, self.cropratio, self.max_count, rng, (img.shape[1], img.shape[0])
        )
        img, seg = _warp_crop_resize(img, seg, meta, self.imagesize, ds.color_input)
        if ds.use_imgaug:
            img = augment_image(img, rng, color=ds.color_input)
        seg = _remap_labels(seg, meta["new_labels"])
        meta["img"] = img
        meta["seg"] = seg[..., None]
        return meta

    def _emit(self, idxs):
        """Assemble one batch from sample indices and enqueue it."""
        seeds = self.rng.integers(0, 2**63 - 1, size=len(idxs))
        samples = list(self.pool.map(self._sample, idxs, seeds))
        batch = {}
        for key in samples[0]:
            if key == "image_id":
                batch[key] = np.asarray([[s[key]] for s in samples])
            else:
                batch[key] = np.stack([s[key] for s in samples])
        while not self._stop:
            try:
                self.queue.put(batch, timeout=1.0)
                return
            except queue.Full:
                continue

    def _produce(self):
        if not self.indices or (self.drop_remainder and len(self.indices) < self.batchsize):
            # No batch will ever form (e.g. batchsize > dataset size): exit
            # instead of re-shuffling an empty epoch in a hot loop.
            return
        while not self._stop:
            order = np.array(self.indices)
            if self.shuffle:
                self.rng.shuffle(order)
            full_end = len(order) - len(order) % self.batchsize
            for start in range(0, full_end, self.batchsize):
                self._emit(order[start : start + self.batchsize])
                if self._stop:
                    return
            if not self.drop_remainder and full_end < len(order):
                # One short batch per epoch (its own compiled shape); used by
                # batched eval so no image is dropped.
                self._emit(order[full_end:])
                if self._stop:
                    return

    def get_next(self):
        return self.queue.get()

    def __iter__(self):
        return self

    def __next__(self):
        return self.get_next()

    def close(self):
        self._stop = True


def make_dataset(dataset, batchsize, epochs, prefetch, imagesize, cropratio, worker, no_objects, shuffle=True,
                 mirrored_strategy=None, seed=None, record_cache_dir=None, drop_remainder=True):
    """Reference-compatible ``generate_dataset``: (iterator, epoch_batches).

    ``drop_remainder=False`` keeps every image: the epoch ends with one
    short batch (counted in ``epoch_batches``) at its own compiled shape.
    """
    del mirrored_strategy  # sharding is handled by the jit step's mesh
    if drop_remainder:
        data_size = len(dataset.imgs) - (len(dataset.imgs) % batchsize)
        epoch_batches = data_size // batchsize
    else:
        data_size = len(dataset.imgs)
        epoch_batches = -(-data_size // batchsize)
    if worker in (0, None):
        worker = 8
    if prefetch in (0, None):
        prefetch = 4
    cache = None
    if record_cache_dir is None:
        record_cache_dir = getattr(dataset, "record_cache_dir", None)
    if record_cache_dir:
        cache = RecordCache(record_cache_dir)
    it = BatchIterator(
        dataset,
        list(range(data_size)),
        batchsize,
        imagesize,
        cropratio,
        max_count=1,
        workers=worker,
        prefetch=prefetch,
        shuffle=shuffle,
        seed=seed,
        record_cache=cache,
        drop_remainder=drop_remainder,
    )
    return it, epoch_batches


def as_reference_tuple(batch, target_seg, dir_maps):
    """Emit the reference's 13-tuple ordering from a batch dict + device maps."""
    return (
        batch["img"],
        target_seg,
        dir_maps,
        batch["keypoints2d"],
        batch["keypoints3d"],
        batch["camera"],
        batch["diameters"],
        batch["offsets"],
        batch["seg"],
        batch["cuboid3d"],
        batch["poses_gt"],
        batch["pixel_gt_count"],
        batch["image_id"],
    )


def prepare_device_batch(img_u8, labelmap, num_classes, rng_key=None, noise=0.0, brightness=0.0, contrast=0.0,
                         saturation=0.0, hue=0.0, color_jitter=False, normal=(0.5, 0.5), grayscale_to_rgb=False):
    """Device-side batch finishing (jit-able).

    uint8 image -> optional color jitter on the RAW 0..255 scale (the
    non-imgaug augmentation path: true hue rotation + saturation +
    brightness + contrast with tf.image semantics — see data/color.py,
    ref vectorfield_dataset.py:261-266) -> normalize ((x/255 - m)/s) ->
    gaussian noise with one batch-level std ~ U(0, noise), clipped to
    [-1, 1] (exactly image_utils.py:4-13 — the reference also draws a
    single stddev per batch); labelmap -> one-hot target segmentation.
    """
    import jax
    import jax.numpy as jnp

    from casapose_tpu.data.color import random_color_jitter

    img = img_u8.astype(jnp.float32)
    if color_jitter and rng_key is not None:
        kj = jax.random.fold_in(rng_key, 0)
        img = random_color_jitter(
            img, kj, hue=hue, saturation=saturation, brightness=brightness, contrast=contrast,
            color=img.shape[-1] == 3,
        )
    img = (img / 255.0 - normal[0]) / normal[1]
    if noise > 0 and rng_key is not None:
        kk = jax.random.split(rng_key, 2)[1]
        std = jax.random.uniform(kk, (1,), minval=0.0, maxval=noise)
        img = img + jax.random.normal(jax.random.fold_in(kk, 1), img.shape) * std
        img = jnp.clip(img, -1.0, 1.0)
    if grayscale_to_rgb and img.shape[-1] == 1:
        img = jnp.repeat(img, 3, axis=-1)

    labels = labelmap[..., 0].astype(jnp.int32)
    target_seg = (labels[..., None] == jnp.arange(num_classes)[None, None, None]).astype(jnp.float32)
    return img, target_seg
