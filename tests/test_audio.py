"""Audio subsystem tests: Opus round-trip, framing, mixing, DSP."""

import numpy as np
import pytest

from kvazzup_tpu.audio.dsp import EchoCanceller, Preprocessor
from kvazzup_tpu.audio.frames import AudioFrameBuffer, AudioMixer
from kvazzup_tpu.audio.opus_codec import OpusDecoder, OpusEncoder, available


def _tone(n, freq=440.0, rate=48000, amp=8000):
    t = np.arange(n) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)


@pytest.mark.skipif(not available(), reason="libopus unavailable")
def test_opus_roundtrip():
    enc = OpusEncoder()
    dec = OpusDecoder()
    frame = _tone(960)  # 20 ms @48k
    outs = []
    for i in range(10):
        pkt = enc.encode(frame)
        assert 0 < len(pkt) < 400
        outs.append(dec.decode(pkt))
    rec = outs[-1].astype(np.float64)
    # Opus adds ~6.5 ms algorithmic delay; correlate over candidate lags
    ff = frame.astype(np.float64)
    best = 0.0
    for lag in range(0, 500, 4):
        a = rec[: len(rec) - lag]
        b = ff[lag : lag + len(a)]
        if len(a) > 100:
            best = max(best, abs(np.corrcoef(a, b)[0, 1]))
    assert best > 0.8, best


@pytest.mark.skipif(not available(), reason="libopus unavailable")
def test_opus_plc():
    enc = OpusEncoder()
    dec = OpusDecoder()
    for _ in range(3):
        dec.decode(enc.encode(_tone(960)))
    out = dec.decode(None)  # packet loss concealment
    assert len(out) > 0


def test_frame_buffer():
    fb = AudioFrameBuffer(960)
    fb.input_data(np.zeros(500, np.int16))
    assert fb.get_frame() is None
    fb.input_data(np.zeros(500, np.int16))
    assert fb.get_frame() is not None
    assert fb.get_frame() is None


def test_mixer():
    mx = AudioMixer()
    mx.add_session(1)
    mx.add_session(2)
    f1 = np.full(960, 100, np.int16)
    f2 = np.full(960, -40, np.int16)
    assert mx.input_frame(1, f1) is None
    mixed = mx.input_frame(2, f2)
    assert mixed is not None
    assert mixed[0] == 60


def test_aec_reduces_echo():
    rng = np.random.default_rng(0)
    aec = EchoCanceller(960, playback_delay_frames=0)
    raw_energy = 0.0
    out_energy = 0.0
    for i in range(40):
        far = rng.normal(0, 3000, 960).astype(np.int16)
        aec.put_echo_frame(far)
        mic = (far * 0.6).astype(np.int16)  # pure echo, no near-end
        out = aec.process_input_frame(mic)
        if i >= 30:
            raw_energy += float(np.mean(mic.astype(np.float64) ** 2))
            out_energy += float(np.mean(out.astype(np.float64) ** 2))
    assert out_energy < raw_energy * 0.2, (out_energy, raw_energy)


def test_agc_converges():
    pre = Preprocessor(agc=True, denoise=False, target_level=6000.0)
    quiet = _tone(960, amp=500)
    out = None
    for _ in range(50):
        out = pre.process(quiet)
    rms = np.sqrt(np.mean(out.astype(np.float64) ** 2))
    assert rms > 2000


def test_audio_output_pacing_and_underruns(tmp_path):
    """AudioOutput (audiooutputdevice parity): clock-paced playback,
    silence fill on underrun, AEC far-end tap, WAV backend round-trip."""
    import time

    import numpy as np

    from kvazzup_tpu.audio.output import (
        FRAME_MS, SAMPLES_PER_FRAME, AudioOutput)

    taps = []
    wav = tmp_path / "out.wav"
    out = AudioOutput(backend="wav", wav_path=str(wav),
                      aec_reference=taps.append)
    tone = (np.sin(np.arange(SAMPLES_PER_FRAME) * 0.05) * 8000).astype(np.int16)
    out.start()
    for _ in range(5):
        out.put_frame(tone)
        time.sleep(FRAME_MS / 1000.0)
    time.sleep(3 * FRAME_MS / 1000.0)  # drain + force an underrun
    out.stop()
    assert out.frames_played >= 5
    assert out.underruns >= 1  # starved at the end -> silence fill counted
    assert len(taps) == out.frames_played  # every played frame hit the AEC tap
    import wave as wave_mod

    with wave_mod.open(str(wav)) as w:
        assert w.getframerate() == 48000 and w.getnchannels() == 1
        assert w.getnframes() == out.frames_played * SAMPLES_PER_FRAME


def test_audio_output_auto_backend_falls_back():
    from kvazzup_tpu.audio.output import AudioOutput

    out = AudioOutput(backend="auto")
    assert out.backend in ("alsa", "null")  # no sound card -> null, honestly
    out.start()
    out.stop()


def test_dereverb_suppresses_tail():
    """Dereverb (SpeexDSP dereverb-stage parity, speexdsp.cpp:99-103):
    an impulse burst followed by an exponential reverb tail — after the
    suppressor, the tail-window energy drops substantially while the
    direct-sound window survives."""
    from kvazzup_tpu.audio.dsp import Dereverb

    rng = np.random.default_rng(3)
    sr = 48000
    n = sr // 2  # 0.5 s
    dry = np.zeros(n, np.float64)
    dry[1000:1480] = rng.normal(0, 9000, 480)  # 10 ms burst
    # synthetic room: exponentially decaying diffuse tail (RT60-ish 300 ms)
    ir = rng.normal(0, 1.0, sr // 4) * np.exp(
        -np.arange(sr // 4) / (sr * 0.043))
    ir[0] = 1.0
    wet = np.convolve(dry, ir)[:n]
    wet = np.clip(wet, -32768, 32767).astype(np.int16)

    drv = Dereverb(half=240, decay=0.6, level=0.4)
    outs = [drv.process(wet[i : i + 480]) for i in range(0, n, 480)]
    out = np.concatenate(outs).astype(np.float64)
    lag = 240  # half-hop algorithmic delay
    tail = slice(8000, 20000)  # well after the burst: pure reverb
    e_wet = float(np.mean(wet[tail].astype(np.float64) ** 2))
    e_out = float(np.mean(out[lag + tail.start : lag + tail.stop] ** 2))
    assert e_out < 0.5 * e_wet, (e_out, e_wet)
    burst = slice(1000, 1480)
    e_burst_in = float(np.mean(wet[burst].astype(np.float64) ** 2))
    e_burst_out = float(np.mean(
        out[lag + burst.start : lag + burst.stop] ** 2))
    assert e_burst_out > 0.2 * e_burst_in, (e_burst_out, e_burst_in)
