"""Video frame extraction for the C3D pipeline.

Rebuild of the OpenCV stage in
`/root/reference/.../extract_C3D_features.py:113-178,739-761`:

  * decode a video into frames, resize to width 400 preserving aspect
    (`extract_frames`, `:129-178`)
  * dump frames as JPEGs in the reference's folder layout
  * "attention" frames: frame * upsampled gazemap, the gaze-weighted input
    variant for attention-conditioned C3D features (`add_attention`,
    `:739-761`)

Decoding is backend-gated: cv2 when importable, then imageio(+ffmpeg/
pyav), and `decode_video` raises a clear error listing the install
options when neither exists. The decode path is exercised end-to-end in
tests/test_streaming.py (synthesized .avi -> frames -> fused C3D+gaze
pipeline).
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np

from ..utils import log, mkdir_p

TARGET_WIDTH = 400  # extract_C3D_features.py:151


def _decoder_backend():
    try:
        import cv2  # noqa: F401
        return "cv2"
    except ImportError:
        pass
    try:
        import imageio  # noqa: F401

        # known_plugins lists every plugin imageio knows ABOUT, installed
        # or not — probe the actual backend packages instead
        try:
            import imageio_ffmpeg  # noqa: F401
            return "imageio"
        except ImportError:
            pass
        try:
            import av  # noqa: F401
            return "imageio"
        except ImportError:
            pass
    except ImportError:
        pass
    return None


def decode_video(path: str) -> Iterator[np.ndarray]:
    """Yield RGB uint8 frames from a video file."""
    backend = _decoder_backend()
    if backend == "cv2":
        import cv2

        cap = cv2.VideoCapture(path)
        try:
            while True:
                ok, frame = cap.read()
                if not ok:
                    break
                yield frame[:, :, ::-1]  # BGR -> RGB
        finally:
            cap.release()
        return
    if backend == "imageio":
        import imageio

        for frame in imageio.imiter(path):
            yield np.asarray(frame)
        return
    raise RuntimeError(
        "No video decode backend available. Install one of: opencv-python, "
        "imageio[ffmpeg], imageio[pyav] — or extract frames offline and use "
        "the JPEG-folder loaders.")


def resize_to_width(frame: np.ndarray,
                    target_width: int = TARGET_WIDTH) -> np.ndarray:
    """Aspect-preserving resize to the reference's 400px extraction width."""
    from PIL import Image

    h, w = frame.shape[:2]
    if w == target_width:
        return frame
    target_height = int(round(h * target_width / w))
    img = Image.fromarray(frame).resize((target_width, target_height),
                                        Image.BILINEAR)
    return np.asarray(img)


def extract_frames(video_path: str, out_dir: str,
                   target_width: int = TARGET_WIDTH,
                   max_frames: Optional[int] = None) -> int:
    """Decode + resize + dump `%06d.jpg` frames; returns the frame count
    (`extract_frames`, extract_C3D_features.py:129-178)."""
    from PIL import Image

    mkdir_p(out_dir)
    count = 0
    for i, frame in enumerate(decode_video(video_path)):
        if max_frames is not None and i >= max_frames:
            break
        frame = resize_to_width(frame, target_width)
        Image.fromarray(frame).save(os.path.join(out_dir, f"{i:06d}.jpg"))
        count += 1
    log.info("extracted %d frames from %s", count, video_path)
    return count


def apply_attention(frames: np.ndarray, gazemaps: np.ndarray) -> np.ndarray:
    """Gaze-weighted frames: frame * gazemap upsampled to frame size
    (`add_attention`, extract_C3D_features.py:739-761).

    frames [N, H, W, 3] uint8/float; gazemaps [N, GH, GW] in [0, 1].
    """
    from PIL import Image

    n, h, w = frames.shape[:3]
    out = np.empty_like(frames)
    for i in range(n):
        # float-mode resize: quantizing through uint8 first would zero
        # softmax probability maps (typical cell ~1/2401 < 1/255)
        gm = Image.fromarray(np.asarray(gazemaps[i], np.float32), mode="F")
        gm = np.asarray(gm.resize((w, h), Image.BILINEAR), np.float32)
        out[i] = (frames[i].astype(np.float32) * gm[..., None]).astype(
            frames.dtype)
    return out


def load_frame_folder(folder: str, image_hw: Optional[tuple[int, int]] = None,
                      backend: str = "pil") -> np.ndarray:
    """Read a dumped frame folder back into [N, H, W, 3] uint8.

    backend="native" uses the C++ threaded libjpeg batch decoder
    (`native/framedec.cc`; falls back to PIL when the library or a
    non-JPEG file is present). Decode-only output is bit-identical to
    PIL; native resize is half-pixel-center bilinear (within +-1 of
    PIL.BILINEAR on photographic content).
    """
    files = sorted(
        os.path.join(folder, f) for f in os.listdir(folder)
        if f.lower().endswith((".jpg", ".jpeg", ".png")))
    if not files:
        return np.zeros((0, 0, 0, 3), np.uint8)

    if backend == "native" and image_hw is not None and \
            all(f.lower().endswith((".jpg", ".jpeg")) for f in files):
        from .. import native

        if native.framedec_available():
            return native.decode_jpeg_batch(files, image_hw)

    from PIL import Image

    frames = []
    for path in files:
        img = Image.open(path).convert("RGB")
        if image_hw is not None and img.size != (image_hw[1], image_hw[0]):
            img = img.resize((image_hw[1], image_hw[0]), Image.BILINEAR)
        frames.append(np.asarray(img))
    return np.stack(frames)
