"""Real-TI-Digits readiness without the licensed corpus (VERDICT item #7).

Fabricates the exact on-disk layout the reference walks —
<root>/Adults/TIDIGITS/{TRAIN,TEST}/<speaker>/<label><take>.wav with
take-letter filenames (reference ti_digits.py:119-123,163-188) — from
synthetic audio written as real PCM16 WAVs, then exercises:

  - the TIDigits walker + label parsing on that tree,
  - the native C++ WAV reader (cs304_tpu/native/wavio.cpp) fuzzed against
    scipy.io.wavfile on those files,
  - the full project3 train/predict scripts via --data-root.
"""
import os
import subprocess
import sys

import numpy as np
import pytest
import scipy.io.wavfile

from cs304_tpu.audio.wav import write_wav_int16
from cs304_tpu.data.synthetic import SyntheticTIDigits
from cs304_tpu.data.ti_digits import DIGIT_LABELS, TIDigits, parse_filename_label

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TAKES = "ab"


@pytest.fixture(scope="module")
def tidigits_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ConvertedTIDigits")
    corpus = SyntheticTIDigits(num_train_speakers=2, num_test_speakers=1,
                               takes_per_digit=len(TAKES), with_sentences=True)
    splits = {
        "TRAIN": (corpus.train_dataset, ["AH", "BC"]),
        "TEST": (corpus.test_dataset, ["CK"]),
    }
    for split, (loader, speakers) in splits.items():
        for label, clips in loader.data.items():
            per_spk = max(1, len(clips) // len(speakers))
            for i, clip in enumerate(clips):
                spk = speakers[min(i // per_spk, len(speakers) - 1)]
                d = root / "Adults" / "TIDIGITS" / split / "MAN" / spk
                d.mkdir(parents=True, exist_ok=True)
                take = TAKES[i % len(TAKES)]
                # Real TI-Digits uses O/Z in filenames too; synthesize the
                # same take-letter naming ("1a.wav" -> label "1").
                path = d / f"{label}{take}.wav"
                if path.exists():  # same label+take from another index
                    path = d / f"{label}{take}{i}.wav"
                    continue  # keep filenames parseable: skip extras
                write_wav_int16(str(path), clip, 16000)
    return str(root)


def test_filename_parsing():
    assert parse_filename_label("1a.wav") == "1"
    assert parse_filename_label("82a.wav") == "82"
    assert parse_filename_label("ZO4b.wav") == "ZO4"


def test_walker_on_fabricated_tree(tidigits_root):
    ds = TIDigits(tidigits_root)
    train, test = ds.train_dataset, ds.test_dataset
    for label in DIGIT_LABELS:
        assert label in train.labels, f"missing {label} in train"
        assert label in test.labels
        clips = train[label]
        assert len(clips) >= 1
        for c in clips:
            assert c.dtype == np.float32
            assert len(c) > 1000
    # Multi-digit sentence labels walked too (mixed-length recordings).
    assert any(len(l) > 1 for l in train.labels)


def test_native_wav_reader_against_scipy(tidigits_root):
    from cs304_tpu.audio.wav import read_wav

    n_checked = 0
    for dirpath, _dirs, files in os.walk(tidigits_root):
        for fn in files:
            if not fn.endswith(".wav"):
                continue
            path = os.path.join(dirpath, fn)
            sr, ref = scipy.io.wavfile.read(path)
            got_sr, got = read_wav(path)
            assert sr == 16000 and got_sr == 16000
            np.testing.assert_array_equal(
                got.astype(np.int16), ref.astype(np.int16), err_msg=path
            )
            n_checked += 1
            if n_checked >= 40:
                return
    assert n_checked > 0


def test_project3_scripts_on_tree(tidigits_root, tmp_path):
    """Train + predict through the real --data-root path (not --synthetic)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["CS304_TRACEBACK"] = "1"
    ck = str(tmp_path / "ck")
    for cmd in (
        ["project3_train.py", "--data-root", tidigits_root,
         "--checkpoint-dir", ck, "--set", "train.max_iterations=4",
         "--set", "train.length_multiple=32"],
        ["project3_predict.py", "--data-root", tidigits_root,
         "--checkpoint-dir", ck],
    ):
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", cmd[0]),
             *cmd[1:], "--log-file", str(tmp_path / "runtime.log")],
            capture_output=True, text=True, env=env, cwd=REPO, timeout=2400,
        )
        assert proc.returncode == 0, (
            f"{cmd[0]} rc={proc.returncode}\n{proc.stdout[-2000:]}"
            f"\n{proc.stderr[-2000:]}"
        )
