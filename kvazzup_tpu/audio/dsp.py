"""Audio DSP as JAX signal kernels: echo cancellation, AGC, noise gating.

Replaces the reference's SpeexDSP wrappers (SURVEY.md §2.6 "host-side DSP
or JAX signal kernels"):
* SpeexAEC parity (/root/reference/src/media/processing/speexaec.cpp:90-205):
  block-NLMS adaptive echo canceller with a delayed playback-reference ring
  buffer and an anti-drift valve.
* SpeexDSP preprocessor parity (speexdsp.cpp:34-86): automatic gain control
  toward a target level + energy-based noise gate (denoise stage) + a
  spectral late-reverberation suppressor (the dereverb stage the reference
  configures at speexdsp.cpp:41,99-103 with decay/level knobs).

All filters run on int16 frames; the adaptive state is a small pytree the
host threads carry between frames.
"""

from __future__ import annotations

import functools
from collections import deque

import numpy as np
import jax
import jax.numpy as jnp


# --------------------------------------------------------------- NLMS AEC


@functools.partial(jax.jit, static_argnames=("taps",))
def _nlms_step(weights, ref_hist, mic, mu, *, taps: int):
    """One frame of block NLMS echo cancellation.

    weights: (taps,) f32 filter; ref_hist: (frame+taps-1,) f32 recent
    far-end samples (oldest first); mic: (frame,) f32.
    Returns (new_weights, echo_estimate, error=echo-cancelled mic)."""
    frame = mic.shape[0]
    # build the convolution matrix implicitly: est[i] = sum_k w[k]*ref[i+taps-1-k]
    idx = jnp.arange(frame)[:, None] + (taps - 1 - jnp.arange(taps))[None, :]
    x = ref_hist[idx]  # (frame, taps)
    est = x @ weights
    err = mic - est
    norm = jnp.sum(x * x, axis=1) + 1e3
    grad = (mu * err / norm)[:, None] * x
    new_w = weights + jnp.sum(grad, axis=0)
    return new_w, est, err


class EchoCanceller:
    """Frame-based AEC with playback-delay ring buffer (SpeexAEC parity)."""

    def __init__(self, frame_samples: int, filter_ms: int = 100,
                 sample_rate: int = 48000, playback_delay_frames: int = 2) -> None:
        self.frame = frame_samples
        self.taps = max(64, sample_rate * filter_ms // 1000 // 8)
        self.weights = jnp.zeros((self.taps,), jnp.float32)
        self._ref_hist = np.zeros(frame_samples + self.taps - 1, np.float32)
        self._playback: deque = deque(maxlen=16)
        self._delay = playback_delay_frames

    def put_echo_frame(self, speaker_frame: np.ndarray) -> None:
        """Far-end (playback) reference input (SpeexAEC::putEchoFrame)."""
        self._playback.append(np.asarray(speaker_frame, np.float32))
        # anti-drift valve: if the reference queue runs ahead, drop frames
        while len(self._playback) > self._delay + 4:
            self._playback.popleft()

    def process_input_frame(self, mic_frame: np.ndarray) -> np.ndarray:
        mic = np.asarray(mic_frame, np.float32)
        ref = self._playback.popleft() if len(self._playback) > self._delay else np.zeros(self.frame, np.float32)
        self._ref_hist = np.concatenate([self._ref_hist[self.frame :], ref])
        w, _est, err = _nlms_step(
            self.weights, jnp.asarray(self._ref_hist), jnp.asarray(mic), 0.5, taps=self.taps
        )
        self.weights = w
        return np.clip(np.asarray(err), -32768, 32767).astype(np.int16)


# ---------------------------------------------------------- AGC + denoise


@jax.jit
def _agc_gate(frame, gain, target_rms, max_gain, gate_rms):
    f = frame.astype(jnp.float32)
    rms = jnp.sqrt(jnp.mean(f * f) + 1e-6)
    desired = jnp.clip(target_rms / rms, 0.1, max_gain)
    new_gain = 0.9 * gain + 0.1 * desired  # smooth adaptation
    gated = jnp.where(rms < gate_rms, 0.3, 1.0)  # soft noise gate
    out = jnp.clip(f * new_gain * gated, -32768, 32767).astype(jnp.int16)
    return out, new_gain


@functools.partial(jax.jit, static_argnames=("half",))
def _dereverb_step(x_full, rev_psd, prev_out_tail, decay, level, *,
                   half: int):
    """One 50%-overlap STFT hop of late-reverb suppression.

    x_full: (2*half,) f32 windowed-input segment (previous half-frame tail
    + current half-frame); rev_psd: (half+1,) running late-reverb PSD
    estimate; prev_out_tail: (half,) synthesis overlap from the previous
    hop.  Model: the late reverb in this hop is the decayed accumulation
    of earlier hops' spectral power (level scales the injection); the
    suppression gain is a floored Wiener rule.  Returns
    (out_half, new_rev_psd, new_out_tail)."""
    n = 2 * half
    win = jnp.sqrt(0.5 - 0.5 * jnp.cos(
        2.0 * jnp.pi * (jnp.arange(n) + 0.5) / n)).astype(jnp.float32)
    X = jnp.fft.rfft(x_full * win)
    pxx = jnp.abs(X) ** 2
    gain2 = jnp.clip(1.0 - rev_psd / (pxx + 1e-6), 0.01, 1.0)
    Y = X * jnp.sqrt(gain2)
    seg = jnp.fft.irfft(Y, n).astype(jnp.float32) * win
    out_half = seg[:half] + prev_out_tail
    new_psd = decay * (rev_psd + level * pxx)
    return out_half, new_psd, seg[half:]


class Dereverb:
    """Late-reverberation suppressor (SpeexDSP dereverb-stage parity).

    decay: per-hop energy retention of the reverb-tail model (the
    reference's SPEEX_PREPROCESS_SET_DEREVERB_DECAY); level: how strongly
    each hop's spectrum feeds the tail estimate (…_DEREVERB_LEVEL).
    Processes int16 frames of any multiple of 2*half with half-frame
    algorithmic delay from the 50% overlap."""

    def __init__(self, half: int = 240, decay: float = 0.5,
                 level: float = 0.2) -> None:
        self.half = half
        self.decay = jnp.float32(decay)
        self.level = jnp.float32(level)
        self.rev_psd = jnp.zeros((half + 1,), jnp.float32)
        self._in_tail = np.zeros(half, np.float32)
        self._out_tail = jnp.zeros((half,), jnp.float32)

    def process(self, frame: np.ndarray) -> np.ndarray:
        f = np.asarray(frame, np.float32)
        outs = []
        for i in range(0, len(f) - len(f) % self.half, self.half):
            cur = f[i : i + self.half]
            x = np.concatenate([self._in_tail, cur])
            out_half, self.rev_psd, self._out_tail = _dereverb_step(
                jnp.asarray(x), self.rev_psd, self._out_tail, self.decay,
                self.level, half=self.half)
            self._in_tail = cur
            outs.append(np.asarray(out_half))
        out = np.concatenate(outs) if outs else np.zeros(0, np.float32)
        return np.clip(out, -32768, 32767).astype(np.int16)


class Preprocessor:
    """AGC + noise gate + dereverb (SpeexDSP preprocessor parity)."""

    def __init__(self, agc: bool = True, denoise: bool = True,
                 target_level: float = 6000.0, max_gain: float = 30.0,
                 dereverb: bool = False, dereverb_decay: float = 0.5,
                 dereverb_level: float = 0.2,
                 frame_samples: int = 480) -> None:
        self.agc = agc
        self.denoise = denoise
        self.target = target_level
        self.max_gain = max_gain
        self.gain = jnp.float32(1.0)
        self.dereverb = (Dereverb(half=frame_samples // 2,
                                  decay=dereverb_decay,
                                  level=dereverb_level)
                         if dereverb else None)

    def process(self, frame: np.ndarray) -> np.ndarray:
        if self.dereverb is not None:
            frame = self.dereverb.process(frame)
        if not (self.agc or self.denoise):
            return np.asarray(frame, np.int16)
        gate = 200.0 if self.denoise else 0.0
        out, self.gain = _agc_gate(
            jnp.asarray(frame, jnp.int16),
            self.gain,
            self.target if self.agc else 1.0,
            self.max_gain if self.agc else 1.0,
            gate,
        )
        return np.asarray(out)
