"""Video IO — ctypes binding over the native C++ `libvface_io.so`.

The framework's replacement for the reference's host video stack
(`cv2.VideoCapture` demux, `scripts/VFace_inference_batch.py:240-245`;
moviepy/ffmpeg mux + GIF, :646-666 of `/root/reference/REFace`). The native
library (``native/vface_io.cc``) is dependency-free C++17:

* Y4M (YUV4MPEG2) read/write — the raw interchange format any ffmpeg host can
  produce/consume (`ffmpeg -i clip.mp4 clip.y4m`);
* uncompressed AVI writer for directly playable output;
* a producer-thread prefetch ring delivering float32 RGB [0,1] frames so host
  decode overlaps device compute (SURVEY §7, hard part 5).

Falls back to a pure-python Y4M implementation when the .so has not been
built (`native/build.sh`), so the package works everywhere; the native path
is the fast one.
"""

from __future__ import annotations

import ctypes
import os
from typing import Iterator, Optional, Tuple

import numpy as np

_LIB = None
_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native", "libvface_io.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        # try building once (g++ is baked into the image); a failed compile
        # must be LOUD — the pure-python fallback is an order of magnitude
        # slower and callers should know they are on it
        build = os.path.join(os.path.dirname(path), "build.sh")
        if os.path.exists(build):
            import subprocess
            import warnings

            proc = subprocess.run(
                ["sh", build], capture_output=True, text=True, timeout=300
            )
            if proc.returncode != 0:
                warnings.warn(
                    "native vface_io build FAILED; falling back to the slow "
                    f"pure-python video IO path.\n{proc.stderr[-2000:]}",
                    RuntimeWarning,
                    stacklevel=2,
                )
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        lib.vf_y4m_open.restype = ctypes.c_void_p
        lib.vf_y4m_open.argtypes = [ctypes.c_char_p]
        lib.vf_y4m_width.argtypes = [ctypes.c_void_p]
        lib.vf_y4m_height.argtypes = [ctypes.c_void_p]
        lib.vf_y4m_fps_num.argtypes = [ctypes.c_void_p]
        lib.vf_y4m_fps_den.argtypes = [ctypes.c_void_p]
        lib.vf_y4m_read_rgb.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.vf_y4m_close.argtypes = [ctypes.c_void_p]
        lib.vf_y4m_create.restype = ctypes.c_void_p
        lib.vf_y4m_create.argtypes = [ctypes.c_char_p] + [ctypes.c_int] * 4
        lib.vf_y4m_write_rgb.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.vf_y4m_close_writer.argtypes = [ctypes.c_void_p]
        lib.vf_avi_create.restype = ctypes.c_void_p
        lib.vf_avi_create.argtypes = [ctypes.c_char_p] + [ctypes.c_int] * 3
        lib.vf_avi_create2.restype = ctypes.c_void_p
        lib.vf_avi_create2.argtypes = [ctypes.c_char_p] + [ctypes.c_int] * 6
        lib.vf_avi_write_rgb.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.vf_avi_write_audio.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32
        ]
        lib.vf_avi_finish.argtypes = [ctypes.c_void_p]
        lib.vf_prefetch_open.restype = ctypes.c_void_p
        lib.vf_prefetch_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.vf_prefetch_width.argtypes = [ctypes.c_void_p]
        lib.vf_prefetch_height.argtypes = [ctypes.c_void_p]
        lib.vf_prefetch_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.vf_prefetch_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


# ------------------------------------------------------------------- readers


def read_y4m(path: str) -> Tuple[np.ndarray, int]:
    """Y4M file → (frames uint8 (N,H,W,3), fps)."""
    lib = _load()
    if lib is None:
        return _read_y4m_py(path)
    h = lib.vf_y4m_open(path.encode())
    if not h:
        raise IOError(f"cannot open Y4M: {path}")
    w, hh = lib.vf_y4m_width(h), lib.vf_y4m_height(h)
    fps = max(1, lib.vf_y4m_fps_num(h) // max(1, lib.vf_y4m_fps_den(h)))
    frames = []
    buf = np.empty((hh, w, 3), np.uint8)
    while lib.vf_y4m_read_rgb(h, buf.ctypes.data_as(ctypes.c_void_p)) == 1:
        frames.append(buf.copy())
    lib.vf_y4m_close(h)
    return np.stack(frames) if frames else np.empty((0, hh, w, 3), np.uint8), fps


def iter_y4m_prefetched(path: str, depth: int = 4) -> Iterator[np.ndarray]:
    """Stream float32 [0,1] frames through the native prefetch ring."""
    lib = _load()
    if lib is None:
        frames, _ = _read_y4m_py(path)
        for f in frames:
            yield f.astype(np.float32) / 255.0
        return
    h = lib.vf_prefetch_open(path.encode(), depth)
    if not h:
        raise IOError(f"cannot open Y4M: {path}")
    w, hh = lib.vf_prefetch_width(h), lib.vf_prefetch_height(h)
    try:
        buf = np.empty((hh, w, 3), np.float32)
        while lib.vf_prefetch_next(h, buf.ctypes.data_as(ctypes.c_void_p)) == 1:
            yield buf.copy()
    finally:
        lib.vf_prefetch_close(h)


# ------------------------------------------------------------------- writers


def write_y4m(path: str, frames_u8: np.ndarray, fps: int = 10) -> None:
    lib = _load()
    if lib is None:
        return _write_y4m_py(path, frames_u8, fps)
    n, hh, w, _ = frames_u8.shape
    h = lib.vf_y4m_create(path.encode(), w, hh, fps, 1)
    if not h:
        raise IOError(f"cannot create Y4M: {path}")
    for f in np.ascontiguousarray(frames_u8):
        lib.vf_y4m_write_rgb(h, f.ctypes.data_as(ctypes.c_void_p))
    lib.vf_y4m_close_writer(h)


def write_avi(
    path: str,
    frames_u8: np.ndarray,
    fps: int = 10,
    audio: Optional[np.ndarray] = None,
    sample_rate: int = 0,
) -> None:
    """Playable uncompressed AVI (the mp4 mux equivalent; fps 10 is the
    reference video operating point, VFace_inference_batch.py:247).

    ``audio``: int16 PCM samples, shape (n_samples,) or (n_samples, channels),
    interleaved into a second AVI stream one frame's worth at a time — the
    audio-passthrough capability of the reference's moviepy mux
    (VFace_inference_batch.py:646-666), with zero external tools.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native vface_io not built; run native/build.sh")
    n, hh, w, _ = frames_u8.shape
    if audio is not None and sample_rate > 0:
        pcm = np.asarray(audio, np.int16)
        if pcm.ndim == 1:
            pcm = pcm[:, None]
        pcm = np.ascontiguousarray(pcm)
        channels = pcm.shape[1]
        h = lib.vf_avi_create2(path.encode(), w, hh, fps, sample_rate, channels, 16)
        if not h:
            raise IOError(f"cannot create AVI: {path}")
        # interleave ~one frame of samples after each video frame
        total = pcm.shape[0]
        frames = np.ascontiguousarray(frames_u8)
        for i in range(n):
            lib.vf_avi_write_rgb(h, frames[i].ctypes.data_as(ctypes.c_void_p))
            s0 = (i * total) // n
            s1 = ((i + 1) * total) // n if i + 1 < n else total
            if s1 > s0:
                chunk = np.ascontiguousarray(pcm[s0:s1])
                lib.vf_avi_write_audio(
                    h, chunk.ctypes.data_as(ctypes.c_void_p), chunk.nbytes
                )
        lib.vf_avi_finish(h)
        return
    h = lib.vf_avi_create(path.encode(), w, hh, fps)
    if not h:
        raise IOError(f"cannot create AVI: {path}")
    for f in np.ascontiguousarray(frames_u8):
        lib.vf_avi_write_rgb(h, f.ctypes.data_as(ctypes.c_void_p))
    lib.vf_avi_finish(h)


def read_wav(path: str) -> Tuple[np.ndarray, int]:
    """WAV file → (int16 PCM (n_samples, channels), sample_rate). Stdlib-only
    source-audio loader for the passthrough mux (`ffmpeg -i in.mp4 in.wav` on
    any host produces the side file next to the Y4M)."""
    import wave

    with wave.open(path, "rb") as f:
        sr = f.getframerate()
        ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(f.getnframes())
    if width == 2:
        pcm = np.frombuffer(raw, np.int16)
    elif width == 1:  # 8-bit unsigned → int16
        pcm = ((np.frombuffer(raw, np.uint8).astype(np.int16) - 128) << 8)
    else:
        raise ValueError(f"unsupported WAV sample width: {width}")
    return pcm.reshape(-1, ch), sr


def write_gif(path: str, frames_u8: np.ndarray, fps: int = 10) -> None:
    """GIF output (reference writes GIFs too, :666) via PIL."""
    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames_u8]
    imgs[0].save(
        path, save_all=True, append_images=imgs[1:], duration=int(1000 / fps), loop=0
    )


# ------------------------------------------------------- pure-python fallback


def _read_y4m_py(path: str):
    with open(path, "rb") as f:
        header = f.readline().decode()
        assert header.startswith("YUV4MPEG2")
        w = h = 0
        fps = 30
        for tok in header.split()[1:]:
            if tok[0] == "W":
                w = int(tok[1:])
            elif tok[0] == "H":
                h = int(tok[1:])
            elif tok[0] == "F":
                num, den = tok[1:].split(":")
                fps = max(1, int(num) // int(den))
        frames = []
        ysz, csz = w * h, (w // 2) * (h // 2)
        while True:
            line = f.readline()
            if not line or not line.startswith(b"FRAME"):
                break
            raw = f.read(ysz + 2 * csz)
            if len(raw) < ysz + 2 * csz:
                break
            y = np.frombuffer(raw[:ysz], np.uint8).reshape(h, w).astype(np.int32)
            u = np.frombuffer(raw[ysz : ysz + csz], np.uint8).reshape(h // 2, w // 2)
            v = np.frombuffer(raw[ysz + csz :], np.uint8).reshape(h // 2, w // 2)
            u = u.repeat(2, 0).repeat(2, 1).astype(np.int32)
            v = v.repeat(2, 0).repeat(2, 1).astype(np.int32)
            c, d, e = y - 16, u - 128, v - 128
            r = np.clip((298 * c + 409 * e + 128) >> 8, 0, 255)
            g = np.clip((298 * c - 100 * d - 208 * e + 128) >> 8, 0, 255)
            b = np.clip((298 * c + 516 * d + 128) >> 8, 0, 255)
            frames.append(np.stack([r, g, b], axis=-1).astype(np.uint8))
        return (np.stack(frames) if frames else np.empty((0, h, w, 3), np.uint8)), fps


def _write_y4m_py(path: str, frames_u8: np.ndarray, fps: int):
    n, h, w, _ = frames_u8.shape
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420jpeg\n".encode())
        for fr in frames_u8.astype(np.int32):
            r, g, b = fr[..., 0], fr[..., 1], fr[..., 2]
            y = np.clip(((66 * r + 129 * g + 25 * b + 128) >> 8) + 16, 0, 255)
            u = np.clip(((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128, 0, 255)
            v = np.clip(((112 * r - 94 * g - 18 * b + 128) >> 8) + 128, 0, 255)
            u = u.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            v = v.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))
            f.write(b"FRAME\n")
            f.write(y.astype(np.uint8).tobytes())
            f.write(u.astype(np.uint8).tobytes())
            f.write(v.astype(np.uint8).tobytes())
