"""MFCC front-end parity vs the librosa-faithful NumPy oracle + scipy primitives."""
import numpy as np
import jax.numpy as jnp
import scipy.fft
import scipy.signal

from cs304_tpu.ops.mfcc import (
    MFCCConfig,
    _savgol_operators,
    dct_ortho_matrix,
    mel_filterbank,
    mfcc_batch,
    mfcc_features,
    mfcc_features_batch,
)
from reference_mfcc import mel_fb, reference_mfcc_features


def make_signal(rng, n, sr=16000):
    """Speech-ish test signal: chirp + harmonics + noise, int16-scale."""
    t = np.arange(n) / sr
    f0 = 120 + 40 * np.sin(2 * np.pi * 1.3 * t)
    sig = np.zeros(n)
    for h in range(1, 6):
        sig += np.sin(2 * np.pi * np.cumsum(f0 * h) / sr) / h
    sig += 0.05 * rng.normal(size=n)
    return (sig * 8000).astype(np.float32)


def test_mel_filterbank_matches_oracle():
    got = mel_filterbank(16000, 320, 40, 133.33, 6855.4976)
    want = mel_fb(16000, 320, 40, 133.33, 6855.4976)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_dct_matches_scipy(rng):
    x = rng.normal(size=(40, 17))
    want = scipy.fft.dct(x, axis=0, type=2, norm="ortho")[:13]
    got = dct_ortho_matrix(13, 40) @ x
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_savgol_operators_match_scipy(rng):
    x = rng.normal(size=(30,))
    for polyorder, deriv in [(1, 1), (2, 2)]:
        want = scipy.signal.savgol_filter(
            x, 9, polyorder=polyorder, deriv=deriv, mode="interp"
        )
        interior, el, er = _savgol_operators(9, polyorder, deriv)
        got = np.zeros_like(x)
        for i in range(4, len(x) - 4):
            got[i] = x[i - 4 : i + 5] @ interior
        got[:4] = el @ x[:9]
        got[-4:] = er @ x[-9:]
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_mfcc_features_match_reference(rng):
    for n in [4000, 7031, 16000]:
        sig = make_signal(rng, n)
        want = reference_mfcc_features(sig)
        got, t_valid = mfcc_features(jnp.asarray(sig))
        got = np.asarray(got)[: int(t_valid)]
        assert got.shape == want.shape
        # Normalized MFCCs are O(1); deltas are O(1..10). fp32 end-to-end
        # tolerance after FFT/mel/log/DCT chain:
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_mfcc_padding_invariance(rng):
    """Features of a padded signal (with mask) == features of the bare signal."""
    sig = make_signal(rng, 5000)
    bare, t_bare = mfcc_features(jnp.asarray(sig))
    padded = np.concatenate([sig, rng.normal(size=3000).astype(np.float32) * 1e4])
    pad_feats, t_pad = mfcc_features(jnp.asarray(padded), num_samples=5000)
    assert int(t_bare) == int(t_pad)
    np.testing.assert_allclose(
        np.asarray(bare)[: int(t_bare)],
        np.asarray(pad_feats)[: int(t_pad)],
        rtol=1e-5,
        atol=1e-5,
    )


def test_mfcc_batch_matches_single(rng):
    sigs = [make_signal(rng, n) for n in (3200, 4800, 2100)]
    batched = mfcc_batch(sigs)
    for sig, feats in zip(sigs, batched):
        want = reference_mfcc_features(sig)
        assert feats.shape == want.shape
        np.testing.assert_allclose(feats, want, rtol=2e-3, atol=2e-3)


def test_spectrogram_backends_agree(rng):
    sig = make_signal(rng, 5000)
    fft_feats, t1 = mfcc_features(jnp.asarray(sig), cfg=MFCCConfig(spectrogram="fft"))
    mm_feats, t2 = mfcc_features(jnp.asarray(sig), cfg=MFCCConfig(spectrogram="matmul"))
    assert int(t1) == int(t2)
    np.testing.assert_allclose(
        np.asarray(fft_feats)[: int(t1)], np.asarray(mm_feats)[: int(t2)],
        rtol=2e-3, atol=2e-3,
    )


# -- general framing (VERDICT r2 #7): hop need not be n_fft/2 ----------------

def oracle_features(signal, cfg):
    """reference_mfcc_features generalized over (n_fft, hop, n_mels, ...)."""
    from reference_mfcc import power_to_db, stft_power

    power = stft_power(np.asarray(signal, np.float64), cfg.n_fft,
                       cfg.hop_length)
    melspec = mel_fb(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin,
                     cfg.fmax) @ power
    log_mel = power_to_db(melspec)
    mfccs = scipy.fft.dct(log_mel, axis=-2, type=2, norm="ortho")[: cfg.n_mfcc]
    d1 = scipy.signal.savgol_filter(mfccs, cfg.delta_width, polyorder=1,
                                    deriv=1, axis=-1, mode="interp")
    d2 = scipy.signal.savgol_filter(mfccs, cfg.delta_width, polyorder=2,
                                    deriv=2, axis=-1, mode="interp")
    norm = (mfccs - mfccs.mean(axis=0)) / (mfccs.std(axis=0) + 1e-8)
    return np.concatenate([norm, d1, d2], axis=0).T


def test_standard_25ms_10ms_config(rng):
    """The industry-standard 25 ms / 10 ms framing (n_fft=400, hop=160) must
    work and match the oracle — it used to die in an opaque reshape error
    (hop*2 != n_fft takes the general strided-block DFT path, g=40)."""
    cfg = MFCCConfig(n_fft=400, hop_length=160)
    for n in (4000, 7031):
        sig = make_signal(rng, n)
        want = oracle_features(sig, cfg)
        got, t_valid = mfcc_features(jnp.asarray(sig), cfg=cfg)
        got = np.asarray(got)[: int(t_valid)]
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_gather_framing_fallback(rng):
    """(n_fft, hop) with no useful block structure (g=5 < 16) exercises the
    gather-framing fallback; still oracle-exact."""
    cfg = MFCCConfig(n_fft=250, hop_length=110)
    sig = make_signal(rng, 6000)
    want = oracle_features(sig, cfg)
    got, t_valid = mfcc_features(jnp.asarray(sig), cfg=cfg)
    got = np.asarray(got)[: int(t_valid)]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_general_framing_fft_backend(rng):
    """The fft backend frames by gather when hop*2 != n_fft; both backends
    agree with each other and the oracle at 25 ms/10 ms."""
    cfg = MFCCConfig(n_fft=400, hop_length=160, spectrogram="fft")
    sig = make_signal(rng, 5000)
    want = oracle_features(sig, cfg)
    got, t_valid = mfcc_features(jnp.asarray(sig), cfg=cfg)
    got = np.asarray(got)[: int(t_valid)]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_general_framing_padding_invariance(rng):
    """Padded-batch masking holds on the general framing path too."""
    cfg = MFCCConfig(n_fft=400, hop_length=160)
    sig = make_signal(rng, 5000)
    bare, t_bare = mfcc_features(jnp.asarray(sig), cfg=cfg)
    padded = np.concatenate(
        [sig, rng.normal(size=3000).astype(np.float32) * 1e4]
    )
    pad_feats, t_pad = mfcc_features(
        jnp.asarray(padded), num_samples=5000, cfg=cfg
    )
    assert int(t_bare) == int(t_pad)
    np.testing.assert_allclose(
        np.asarray(bare)[: int(t_bare)],
        np.asarray(pad_feats)[: int(t_pad)],
        rtol=1e-5, atol=1e-5,
    )
