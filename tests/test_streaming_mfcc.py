"""Streaming MFCC == offline MFCC when the dB reference is calibrated."""
import numpy as np
import jax.numpy as jnp

from cs304_tpu.ops.mfcc import MFCCConfig, mfcc_features
from cs304_tpu.ops.streaming_mfcc import StreamingMFCC
from reference_mfcc import mel_fb, stft_power


def true_ref_power(sig):
    """The utterance's true mel-power max (what power_to_db(ref=max) uses)."""
    power = stft_power(np.asarray(sig, np.float64))
    mel = mel_fb(16000, 320, 40, 133.33, 6855.4976) @ power
    return float(mel.max())


def make_signal(rng, n):
    t = np.arange(n) / 16000
    sig = np.sin(2 * np.pi * 440 * t) + 0.5 * np.sin(2 * np.pi * 1330 * t)
    return (sig * 5000 + rng.normal(0, 40, n)).astype(np.float32)


def test_streaming_matches_offline_with_calibrated_ref(rng):
    sig = make_signal(rng, 6400)
    offline, t_valid = mfcc_features(jnp.asarray(sig))
    offline = np.asarray(offline)[: int(t_valid)]

    sm = StreamingMFCC(ref_power=true_ref_power(sig))
    chunks = np.array_split(sig, 9)
    frames = [sm.feed(c) for c in chunks]
    frames.append(sm.finalize())
    streamed = np.concatenate([f for f in frames if len(f)])
    assert streamed.shape == offline.shape
    np.testing.assert_allclose(streamed, offline, rtol=2e-3, atol=2e-3)


def test_streaming_latency_is_four_frames(rng):
    sig = make_signal(rng, 6400)
    sm = StreamingMFCC(ref_power=true_ref_power(sig))
    # 2240 samples + 160 lead pad -> 14 buffered frames; half=4 lookahead
    # -> 10 emitted.
    got = sm.feed(sig[: 160 * 12 + 320])
    assert got.shape[0] == 10
    rest = sm.finalize()
    assert rest.shape[0] >= 4


def test_chunking_invariance(rng):
    sig = make_signal(rng, 4800)
    ref = true_ref_power(sig)
    outs = []
    for splits in (1, 5, 30):
        sm = StreamingMFCC(ref_power=ref)
        frames = [sm.feed(c) for c in np.array_split(sig, splits)]
        frames.append(sm.finalize())
        outs.append(np.concatenate([f for f in frames if len(f)]))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5)
    np.testing.assert_allclose(outs[0], outs[2], rtol=1e-5)
