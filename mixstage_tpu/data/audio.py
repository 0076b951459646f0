"""Audio modality: from-scratch log-mel speech frontend + offline CLI.

Parity target: reference ``Audio`` (``/root/reference/src/data/audio.py:28-187``)
— ``log_mel_512`` (:117-121), ``log_mel_400`` (:123-148), ``silence``
(:150-171) and the rows-per-second map (:173-179).

The reference delegates to librosa; here the whole DSP chain (STFT, Slaney mel
filterbank, log compression) is implemented directly in numpy with a mirrored
``jax.numpy`` path (`log_mel_spectrogram_jax`) so the frontend can run jitted
on TPU as part of the serving graph (BASELINE.json north star).
"""

from __future__ import annotations

import warnings
from pathlib import Path
from typing import Optional

import numpy as np

from mixstage_tpu.data.common import MissingData, Modality

# ---------------------------------------------------------------------------
# DSP primitives (Slaney mel scale, matching librosa defaults)
# ---------------------------------------------------------------------------


def hz_to_mel(f, htk: bool = False):
    f = np.asanyarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep,
                    mel)


def mel_to_hz(m, htk: bool = False):
    m = np.asanyarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    f_sp * m)


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: Optional[float] = None, norm: Optional[str] = "slaney",
                   htk: bool = False) -> np.ndarray:
    """Triangular mel filterbank, (n_mels, 1 + n_fft//2)."""
    if fmax is None:
        fmax = sr / 2.0
    fft_freqs = np.linspace(0, sr / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
        weights *= enorm[:, None]
    return weights


def frame_signal(y: np.ndarray, frame_length: int, hop_length: int,
                 center: bool = True) -> np.ndarray:
    if center:
        y = np.pad(y, frame_length // 2, mode="reflect")
    n_frames = 1 + (len(y) - frame_length) // hop_length
    idx = (np.arange(frame_length)[None, :]
           + hop_length * np.arange(n_frames)[:, None])
    return y[idx]


def stft_mag(y: np.ndarray, n_fft: int, hop_length: int,
             win_length: Optional[int] = None, center: bool = True,
             power: float = 1.0) -> np.ndarray:
    """Magnitude (power) STFT with a periodic Hann window, (frames, bins)."""
    if win_length is None:
        win_length = n_fft
    window = np.hanning(win_length + 1)[:-1]  # periodic hann (librosa default)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = np.pad(window, (pad, n_fft - win_length - pad))
    frames = frame_signal(y, n_fft, hop_length, center=center)
    spec = np.abs(np.fft.rfft(frames * window[None, :], n=n_fft, axis=-1))
    return spec ** power


def resample_audio(y: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return y
    from fractions import Fraction

    import scipy.signal

    frac = Fraction(target_sr, orig_sr).limit_denominator(1000)
    return scipy.signal.resample_poly(y, frac.numerator, frac.denominator)


# ---------------------------------------------------------------------------
# The two reference log-mel variants
# ---------------------------------------------------------------------------


def log_mel_512(y: np.ndarray, sr: int, eps: float = 1e-10) -> np.ndarray:
    """Power mel spectrogram, n_fft=2048 hop=512, 128 mels → (frames, 128)
    (reference audio.py:117-121)."""
    spec = stft_mag(y, n_fft=2048, hop_length=512, center=True, power=2.0)
    fb = mel_filterbank(sr, 2048, 128, 0.0, sr / 2.0, norm="slaney")
    mel = spec @ fb.T
    mel = np.where(mel == 0, eps, mel)
    return np.log(mel)


def log_mel_400(y: np.ndarray, sr: int, eps: float = 1e-6) -> np.ndarray:
    """16 kHz magnitude mel, n_fft=512 hop=160 win=400 center=False, 64 mels
    fmin=125 fmax=7500 norm=None → (frames, 64) (reference audio.py:123-148)."""
    y = resample_audio(y, sr, 16000)
    spec = stft_mag(y.reshape(-1), n_fft=512, hop_length=160, win_length=400,
                    center=False, power=1.0)
    fb = mel_filterbank(16000, 512, 64, 125.0, 7500.0, norm=None)
    mel = spec @ fb.T
    mel = np.where(mel == 0, eps, mel)
    return np.log(mel)


def log_mel_spectrogram_jax(y, sr: int = 16000, n_fft: int = 512,
                            hop_length: int = 160, win_length: int = 400,
                            n_mels: int = 64, fmin: float = 125.0,
                            fmax: float = 7500.0, eps: float = 1e-6):
    """Jittable log-mel frontend (the TPU serving path).

    Matches :func:`log_mel_400` on already-16kHz input.  The filterbank is a
    compile-time constant; framing is a gather and the FFT/matmul run on
    device, so audio→pose can be served as one XLA graph.
    """
    import jax.numpy as jnp

    window = np.hanning(win_length + 1)[:-1]
    pad = (n_fft - win_length) // 2
    window = np.pad(window, (pad, n_fft - win_length - pad))
    fb = mel_filterbank(sr, n_fft, n_mels, fmin, fmax, norm=None)

    n_frames = 1 + (y.shape[-1] - n_fft) // hop_length
    idx = (np.arange(n_fft)[None, :] + hop_length * np.arange(n_frames)[:, None])
    frames = y[..., idx] * jnp.asarray(window, y.dtype)
    spec = jnp.abs(jnp.fft.rfft(frames, n=n_fft, axis=-1))
    mel = spec @ jnp.asarray(fb.T, y.dtype)
    return jnp.log(jnp.maximum(mel, eps))


def silence_vad(y: np.ndarray, sr: int) -> np.ndarray:
    """webrtcvad-based silence mask at 15 rows/sec (reference audio.py:150-171).
    Falls back to an energy-based VAD when webrtcvad is unavailable."""
    y16 = resample_audio(y, sr, 16000)
    fs_old, fs_new = 16000, 15
    ranges = np.arange(0, y16.shape[0], fs_old / fs_new)
    starts, ends = ranges[:-1], ranges[1:]
    try:
        import webrtcvad

        vad = webrtcvad.Vad(3)
        pcm = (np.clip(y16, -1, 1) * 32767).astype(np.int16)

        def is_speech(s, e):
            sub = np.arange(s, e, fs_old / 100)
            flags = [vad.is_speech(pcm[int(a):int(b)].tobytes(), fs_old)
                     for a, b in zip(sub[:-1], sub[1:])]
            return np.mean(flags) > 0.5
    except ImportError:
        thresh = 0.1 * np.sqrt(np.mean(y16 ** 2) + 1e-12)

        def is_speech(s, e):
            return np.sqrt(np.mean(y16[int(s):int(e)] ** 2)) > thresh

    out = []
    for s, e in zip(starts, ends):
        out.append(int(not is_speech(s, e)))
        out.append(0)
    return np.array(out, dtype=np.int64)


# ---------------------------------------------------------------------------
# Modality wrapper + offline CLI
# ---------------------------------------------------------------------------


class Audio(Modality):
    def __init__(self, path2data="../dataset/groot/data",
                 path2outdata="../dataset/groot/data", speaker="all",
                 preprocess_methods=("log_mel_512",)):
        super().__init__(path2data=path2data, path2outdata=path2outdata,
                         speaker=speaker, preprocess_methods=preprocess_methods)
        self.missing = MissingData(self.path2data)

    @property
    def preprocess_map(self):
        return {"log_mel_512": log_mel_512,
                "log_mel_400": log_mel_400,
                "silence": silence_vad}

    @property
    def fs_map(self):
        # rows per second of each representation (reference audio.py:173-179)
        return {"log_mel_512": int(45.6 * 1000 / 512),   # 89
                "log_mel_400": int(16.52 * 1000 / 160),  # 103
                "silence": 15}

    def fs(self, modality):
        return self.fs_map[modality.split("/")[-1]]

    @property
    def h5_key(self):
        return "audio"

    def load_waveform(self, filename):
        """mp3/wav → mono float waveform.  Uses soundfile when present; the
        reference used librosa (audio.py:96)."""
        try:
            import soundfile as sf

            y, sr = sf.read(str(filename), always_2d=False)
            if y.ndim > 1:
                y = y.mean(axis=-1)
            return y.astype(np.float64), sr
        except ImportError as e:
            raise RuntimeError(
                "no audio decoder available (install soundfile) — "
                f"cannot read {filename}") from e

    def preprocess(self):
        speakers = self.speaker if self.speaker[0] != "all" else self.speakers
        from joblib import Parallel, delayed

        for speaker in speakers:
            df_speaker = self.get_df_subset("speaker", speaker)
            interval_ids = df_speaker["interval_id"].unique()
            parent = Path(self.path2data) / "raw" / f"{speaker}_cropped"
            if not parent.exists():
                warnings.warn(f"raw audio dir missing for {speaker}")
                continue
            filenames = [f for f in parent.iterdir() if f.suffix == ".mp3"]
            filename_dict = {f.stem.split("_")[-1]: f for f in filenames}
            missing = Parallel(n_jobs=-1)(
                delayed(self.save_intervals)(i, speaker, filename_dict)
                for i in interval_ids)
            self.missing.save_intervals(missing)

    def save_intervals(self, interval_id, speaker, filename_dict):
        if interval_id not in filename_dict:
            warnings.warn(f"interval_id: {interval_id} not found.")
            return interval_id
        try:
            y, sr = self.load_waveform(filename_dict[interval_id])
        except Exception:
            return interval_id
        for method in self.preprocess_methods:
            processed = self.preprocess_map[method](y, sr)
            filename = (Path(self.path2outdata) / "processed" / speaker
                        / f"{interval_id}.h5")
            self.append(filename, self.add_key(self.h5_key, [method]), processed)
        return None


if __name__ == "__main__":
    # Executable self-test (reference audio.py:189-198 runs its preprocessing
    # main as an integration test): both DSP frontends on a synthetic chirp,
    # plus numpy-vs-jittable log_mel_400 agreement.
    sr = 16000
    t = np.arange(sr * 2) / sr
    y = (0.5 * np.sin(2 * np.pi * 440 * t * (1 + t / 4))).astype(np.float64)

    m512 = log_mel_512(y, sr)
    m400 = log_mel_400(y, sr)
    print(f"log_mel_512: {m512.shape}, range [{m512.min():.2f}, {m512.max():.2f}]")
    print(f"log_mel_400: {m400.shape}, range [{m400.min():.2f}, {m400.max():.2f}]")
    assert m512.shape[1] == 128 and m400.shape[1] == 64

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    mj = np.asarray(log_mel_spectrogram_jax(y, sr))
    dev = np.max(np.abs(mj - m400[: mj.shape[0]]))
    print(f"jittable vs numpy log_mel_400: max |Δ| = {dev:.2e}")
    assert dev < 1e-3, dev

    vad = silence_vad(y, sr)
    print(f"silence_vad: {vad.shape}, silent share {float(vad.mean()):.2f}")
    print("Audio self-test OK")
