"""CLI wiring for the rich-decode options (--confidence, --spot,
--lattice-dot/--lattice-method, --bigram-lm) against a tiny trained
checkpoint — faster than the full chain test, targeted at the round-2
serving surfaces of project6_interactive.py / project5_test_ndigits.py.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """Train a 3-word checkpoint directly through the library (fast) and
    save it in the scripts' npz format."""
    from cs304_tpu.data.synthetic import SyntheticTIDigits
    from cs304_tpu.models.train_kmeans import (
        SegmentalKMeansConfig,
        train_word_hmm,
    )
    from cs304_tpu.ops.mfcc import mfcc_batch
    from cs304_tpu.utils.checkpoint import save_models

    corpus = SyntheticTIDigits(
        num_train_speakers=2, num_test_speakers=1, takes_per_digit=2
    )
    models = {}
    for label in ("3", "5", "7"):
        feats = mfcc_batch(corpus.train_dataset[label])
        models[label] = train_word_hmm(
            label, feats,
            SegmentalKMeansConfig(num_states=5, max_iterations=4,
                                  length_multiple=32),
        ).model
    d = tmp_path_factory.mktemp("rich_ckpt")
    save_models(models, str(d))

    wav = str(d / "utt.wav")
    from cs304_tpu.audio.wav import write_wav_int16

    write_wav_int16(wav, corpus.sentence_audio("375", 0, jitter_seed=3), 16000)
    return {"ckpt": str(d), "wav": wav}


def run_script(name, *args):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["CS304_TRACEBACK"] = "1"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", name), *args],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=2400,
    )
    assert proc.returncode == 0, (
        f"{name} rc={proc.returncode}\nstdout:\n{proc.stdout[-3000:]}"
        f"\nstderr:\n{proc.stderr[-3000:]}"
    )
    return proc.stdout


def test_interactive_rich_outputs(tiny_ckpt, tmp_path):
    dot = str(tmp_path / "lat.dot")
    out = run_script(
        "project6_interactive.py", "--wav", tiny_ckpt["wav"],
        "--checkpoint-dir", tiny_ckpt["ckpt"],
        "--confidence", "--spot", "7", "--lattice-dot", dot,
        "--lattice-method", "forward",
        "--log-file", str(tmp_path / "runtime.log"),
    )
    assert "decoded:" in out
    assert "confidence" in out
    assert "7" in out  # spot line or decode
    with open(dot) as fh:
        dot_src = fh.read()
    assert dot_src.startswith("digraph") and "->" in dot_src

    out2 = run_script(
        "project6_interactive.py", "--wav", tiny_ckpt["wav"],
        "--checkpoint-dir", tiny_ckpt["ckpt"],
        "--lattice-dot", dot, "--lattice-method", "nbest",
        "--log-file", str(tmp_path / "runtime.log"),
    )
    assert "lattice:" in out2


def test_interactive_grammar_options(tiny_ckpt, tmp_path):
    out = run_script(
        "project6_interactive.py", "--wav", tiny_ckpt["wav"],
        "--checkpoint-dir", tiny_ckpt["ckpt"],
        "--grammar-strings", "375,573",
        "--log-file", str(tmp_path / "runtime.log"),
    )
    assert "decoded: 375" in out or "decoded: 573" in out

    out2 = run_script(
        "project6_interactive.py", "--wav", tiny_ckpt["wav"],
        "--checkpoint-dir", tiny_ckpt["ckpt"],
        "--grammar-pattern", "37:*:*",
        "--log-file", str(tmp_path / "runtime.log"),
    )
    decoded = [l for l in out2.splitlines() if l.startswith("decoded:")][0]
    text = decoded.split()[-1]
    assert len(text) == 3 and text[0] in "37"


def test_transcribe_batch_tool(tiny_ckpt, tmp_path):
    import csv as csvmod

    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    import shutil

    shutil.copy(tiny_ckpt["wav"], wav_dir / "utt1.wav")
    shutil.copy(tiny_ckpt["wav"], wav_dir / "utt2.wav")
    out_csv = str(tmp_path / "transcripts.csv")
    out = run_script(
        "transcribe.py", "--checkpoint-dir", tiny_ckpt["ckpt"],
        "--wav-dir", str(wav_dir), "--confidence", "--timings",
        "--csv-out", out_csv,
        "--log-file", str(tmp_path / "runtime.log"),
    )
    assert "utt1.wav" in out and "utt2.wav" in out
    with open(out_csv) as fh:
        rows = list(csvmod.reader(fh, delimiter="|"))
    header, body = rows[0], rows[1:]
    assert len(body) == 2
    text_i = header.index("text")
    conf_i = header.index("confidence")
    timing_i = header.index("timings")
    for r in body:
        assert r[text_i] == "375"
        assert 0.0 <= float(r[conf_i]) <= 1.0
        assert "3:" in r[timing_i]

    # Grammar-constrained batch mode.
    out2 = run_script(
        "transcribe.py", "--checkpoint-dir", tiny_ckpt["ckpt"],
        "--wav", tiny_ckpt["wav"], "--grammar-strings", "375,573",
        "--log-file", str(tmp_path / "runtime.log"),
    )
    assert ": 375" in out2 or ": 573" in out2


def test_ndigits_eval_wer_and_bigram(tiny_ckpt, tmp_path):
    out = run_script(
        "project5_test_ndigits.py", "--synthetic",
        "--checkpoint-dir", tiny_ckpt["ckpt"], "--n-digits", "1",
        "--max-per-label", "2", "--bigram-lm", "--lm-weight", "0.5",
        "--log-file", str(tmp_path / "runtime.log"),
    )
    assert "exact-sequence accuracy" in out
    assert "WER" in out
    assert "bigram LM" in out


def test_interactive_rescore_and_consensus_net(tiny_ckpt, tmp_path):
    """--rescore-lm (lattice LM rescoring) and --consensus-net (sausage
    decode) both run end-to-end and emit vocabulary-only hypotheses."""
    lm_file = tmp_path / "lm.txt"
    lm_file.write_text("375\n573\n735\n")
    out = run_script(
        "project6_interactive.py", "--wav", tiny_ckpt["wav"],
        "--checkpoint-dir", tiny_ckpt["ckpt"],
        "--rescore-lm", str(lm_file), "--lm-weight", "1.0",
        "--consensus-net",
        "--log-file", str(tmp_path / "runtime.log"),
    )
    rescored = [l for l in out.splitlines() if l.startswith("rescored:")]
    assert rescored and set(rescored[0].split()[1]) <= set("357")
    cn = [l for l in out.splitlines() if l.startswith("consensus-net:")]
    assert cn
    assert "slot [" in out  # slot table printed
    if len(cn[0].split()) > 1:
        assert set(cn[0].split()[1]) <= set("357")
