#!/usr/bin/env python
"""Accuracy benchmark: the full reference pipeline on the synthetic corpus.

Runs project3 boot -> project5 silence model -> project6 embedded training ->
continuous decoding, and prints exact-sequence accuracy per digit count and
split as JSON lines. This is the accuracy analogue of bench.py (the
reference's only published number is 85% exact-sequence accuracy after
continuous training, its README.md:9). Takes several minutes end to end.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from cs304_tpu.audio.endpointing import SignalSeparation
from cs304_tpu.data.synthetic import SyntheticTIDigits
from cs304_tpu.data.ti_digits import DIGIT_LABELS
from cs304_tpu.models.decoder import ContinuousDecoder
from cs304_tpu.models.train_continuous import ContinuousTrainConfig, ContinuousTrainer
from cs304_tpu.models.train_kmeans import (
    SegmentalKMeansConfig,
    train_digit_models,
    train_word_hmm,
)
from cs304_tpu.ops.mfcc import mfcc_batch


def main() -> None:
    corpus = SyntheticTIDigits(
        num_train_speakers=6, num_test_speakers=2, takes_per_digit=3,
        with_sentences=True,
    )
    sep = SignalSeparation()
    feats = {
        l: mfcc_batch(sep.remove_empty_batch(corpus.train_dataset[l]))
        for l in DIGIT_LABELS
    }
    boot = train_digit_models(
        feats, SegmentalKMeansConfig(num_states=5, max_iterations=15,
                                     length_multiple=32),
    )
    noises = [n for n in sep.get_all_noises() if len(n) >= 9 * sep.frame_size]
    boot["S"] = train_word_hmm(
        "S", mfcc_batch(noises),
        SegmentalKMeansConfig(num_states=3, max_iterations=15, length_multiple=32),
    ).model

    labeled = {}
    for n in (2, 4, 7):
        for tr, utts in corpus.train_dataset.get_all_n_digits(n).items():
            labeled[tr] = mfcc_batch(utts)
    trainer = ContinuousTrainer(
        boot, ContinuousTrainConfig(max_iterations=5, cov_reg=0.1)
    )
    iters = trainer.train(labeled)
    decoder = ContinuousDecoder(trainer.models(), penalty=-100.0)

    results = {"embedded_iterations": iters}
    for n in (2, 4, 7):
        for split, ds in (("train", corpus.train_dataset),
                          ("test", corpus.test_dataset)):
            truths, clips = [], []
            for tr, utts in ds.get_all_n_digits(n).items():
                for u in utts:
                    truths.append(tr)
                    clips.append(u)
            preds = decoder.predict_batch(mfcc_batch(clips))
            acc = float(np.mean([p == t for p, t in zip(preds, truths)]))
            results[f"exact_seq_acc_n{n}_{split}"] = round(acc, 4)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
