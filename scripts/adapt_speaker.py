#!/usr/bin/env python
"""MAP speaker adaptation CLI: enroll a speaker, save an adapted checkpoint.

Feed a few enrollment WAVs with known transcripts; the word-model means are
MAP-interpolated toward the speaker's forced-alignment statistics
(models/adapt.py) and saved as a new checkpoint usable by every decode
script. (No reference equivalent — the reference's only answer to a new
speaker/channel was retraining.)

Example:
  python scripts/adapt_speaker.py --checkpoint-dir .cache/m6 \
      --out-dir .cache/m6_alice \
      --wav a1.wav --transcript 375 --wav a2.wav --transcript 186Z --tau 20
"""
from dataclasses import replace

from _common import adopt_checkpoint_frontend, base_parser, load_config, run_main

from cs304_tpu.models.adapt import map_adapt
from cs304_tpu.ops.mfcc import mfcc_batch
from cs304_tpu.utils.checkpoint import load_manifest, load_models, save_models


def main() -> None:
    parser = base_parser(__doc__)
    parser.add_argument("--out-dir", required=True,
                        help="directory for the adapted checkpoint")
    parser.add_argument("--wav", action="append", default=[], required=True,
                        help="enrollment WAV (repeatable)")
    parser.add_argument("--transcript", action="append", default=[],
                        required=True,
                        help="digit transcript for the matching --wav")
    parser.add_argument("--tau", type=float, default=20.0,
                        help="MAP prior weight (equivalent prior frames per "
                             "state; smaller = trust enrollment more)")
    parser.add_argument("--adapt-silence", action="store_true",
                        help="also adapt the silence model")
    args = parser.parse_args()
    if len(args.wav) != len(args.transcript):
        raise SystemExit("error: need one --transcript per --wav")
    cfg = load_config(args)
    adopt_checkpoint_frontend(cfg, args)
    mcfg = cfg.frontend.mfcc_config()

    models = load_models(cfg.checkpoint_dir)
    from cs304_tpu.audio.wav import read_wav

    labeled = {}
    for wav_path, transcript in zip(args.wav, args.transcript):
        rate, signal = read_wav(wav_path)
        feats = mfcc_batch(
            [signal], cfg=replace(mcfg, sample_rate=float(rate))
        )
        labeled.setdefault(transcript, []).append(feats[0])

    adapted = map_adapt(
        models, labeled, tau=args.tau, adapt_silence=args.adapt_silence
    )
    frontend = None
    try:
        frontend = load_manifest(cfg.checkpoint_dir).get("frontend")
    except OSError:
        pass
    save_models(adapted, args.out_dir, frontend=frontend)
    print(f"adapted {len(adapted)} models on {len(args.wav)} enrollment "
          f"utterance(s) (tau={args.tau}) -> {args.out_dir}")


if __name__ == "__main__":
    run_main(main)
