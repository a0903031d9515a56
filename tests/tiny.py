"""Tiny model/data configs shared by e2e tests: a miniature CSMSC-shaped
recipe (mel dim 8, frameshift 4 samples, 2 stages, 2 heads) that runs the
full stack on CPU in seconds."""

import numpy as np

from msmctts_tpu.config import Config

FRAMESHIFT = 4
MEL_DIM = 8


def tiny_ae_config(tmpdir: str) -> Config:
    return Config(
        {
            "id": "tiny_ae",
            "task": {
                "_name": "MSMCTTS",
                "_mode": "train_autoencoder",
                "autoencoder": {
                    "_name": "MSMCVQGAN",
                    "in_dim": MEL_DIM,
                    "n_model_size": 16,
                    "encoder_config": {
                        "downsample_scales": [1, 2],
                        "max_seq_len": 64,
                        "n_layers": 1,
                        "n_head": 2,
                        "d_k": 8,
                        "d_v": 8,
                        "d_inner": 32,
                        "dropout": 0.1,
                        "attn_dropout": 0.0,
                    },
                    "quantizer_config": {
                        "embedding_sizes": 8,
                        "embedding_dims": 16,
                        "n_heads": 2,
                        "prior_config": {
                            "kernel_size": 3,
                            "dilation_rate": 1,
                            "n_layers": 1,
                        },
                    },
                    "frame_decoder_config": {
                        "max_seq_len": 64,
                        "n_layers": 1,
                        "n_head": 2,
                        "d_k": 8,
                        "d_v": 8,
                        "d_inner": 32,
                        "dropout": 0.1,
                        "attn_dropout": 0.0,
                    },
                    "pred_mel": True,
                    "decoder_config": {
                        "upsample_rates": [2, 2],
                        "upsample_kernel_sizes": [4, 4],
                        "upsample_initial_channel": 16,
                        "resblock_kernel_sizes": [3],
                        "resblock_dilation_sizes": [[1, 3]],
                    },
                },
                "discriminator": {
                    "_name": "UnivNetDiscriminator",
                    "mrd_config": {
                        "hop_lengths": [4, 8],
                        "hidden_channels": [32, 32],
                        "domain": "double",
                        "mel_scale": True,
                        "sample_rate": 1600,
                    },
                    "mpd_config": {"periods": [2, 3], "channels": 4, "max_channels": 16},
                },
            },
            "trainer": {
                "_name": "VQGANTrainer",
                "grad_clip_thresh": 1.0,
                "warmup_steps": 2,
                "sample_lengths": 32,  # 8 frames
                "lambda_vq": 1,
                "lambda_pr": 0.1,
                "lambda_frame": 10,
                "lambda_fm": 2,
                "lambda_stft": 4.5,
                "stft_loss_config": {
                    "fft_size": 64,
                    "hop_size": 16,
                    "win_size": 64,
                    "num_mels": 8,
                },
            },
            "optimizer": {
                "_default": {
                    "_name": "AdamW",
                    "learning_rate": 2e-4,
                    "betas": [0.8, 0.99],
                    "eps": 1e-8,
                    "weight_decay": 0.0,
                }
            },
            "dataloader": {"batch_size": 4, "num_workers": 0},
            "dataset": {
                "_name": "MelDataset",
                "id_list": f"{tmpdir}/train.list",
                "samplerate": 1600,
                "feature": ["mel", "wav"],
                "feature_path": [f"{tmpdir}/mel/{{}}.npy", f"{tmpdir}/wav/{{}}.wav"],
                "dimension": [MEL_DIM, 1],
                "frameshift": [FRAMESHIFT, 1],
                "padding_value": [-4, 0],
                "segment_length": -1,
            },
            "lr_scheduler": {
                "_name": "ExponentialDecayLRScheduler",
                "warmup_steps": 100,
                "decay_scale": 100,
                "decay_learning_rate": 0.5,
                "final_learning_rate": 1e-5,
            },
            "save_checkpoint_dir": f"{tmpdir}/ckpt_ae",
            "training_steps": 10,
            "iters_per_checkpoint": 5,
            "save_features": [["wav", ".wav", 1600]],
        }
    )


def tiny_am_config(tmpdir: str, ae_checkpoint: str) -> Config:
    return Config(
        {
            "id": "tiny_am",
            "task": {
                "_name": "MSMCTTS",
                "_mode": "train_predictor",
                "predictor": {
                    "_name": "MultiStagePredictor",
                    "n_symbols": [20, 5],
                    "n_model_size": 16,
                    "n_pred_size": 16,
                    "n_pred_scale": [2, 1],
                    "encoder_config": {
                        "max_seq_len": 32,
                        "n_layers": 1,
                        "n_head": 2,
                        "d_k": 8,
                        "d_v": 8,
                        "d_model": 16,
                        "d_inner": 32,
                        "dropout": 0.1,
                    },
                    "adaptor_config": {
                        "input_size": 16,
                        "duration_predictor_filter_size": 8,
                        "duration_predictor_kernel_size": 3,
                        "dropout": 0.1,
                    },
                    "decoder_config": {
                        "max_seq_len": 64,
                        "n_layers": 1,
                        "n_head": 2,
                        "d_k": 8,
                        "d_v": 8,
                        "d_model": 16,
                        "d_inner": 32,
                        "dropout": 0.1,
                    },
                },
                "autoencoder": {"_checkpoint": ae_checkpoint, "_trainable": False},
            },
            "trainer": {
                "_name": "PredictorTrainer",
                "grad_clip_thresh": 10.0,
                "training_methods": ["mse", "triple_sum"],
                "loss_weights": [[1.0, 1.0], [1.0, 1.0]],
                "lambda_dur": 1.0,
            },
            "optimizer": {
                "_default": {
                    "_name": "Adam",
                    "betas": [0.9, 0.98],
                    "eps": 1e-9,
                    "weight_decay": 0,
                    "learning_rate": 2e-4,
                }
            },
            "dataloader": {"batch_size": 4, "num_workers": 0},
            "dataset": {
                "_name": "TTSDataset",
                "id_list": f"{tmpdir}/train.list",
                "samplerate": 1600,
                "feature": ["text", "dur", "mel"],
                "feature_path": [
                    f"{tmpdir}/phone.txt",
                    f"{tmpdir}/dur.txt",
                    f"{tmpdir}/mel/{{}}.npy",
                ],
                "dimension": [2, 1, MEL_DIM],
                "padding_value": [0, 0, -4],
                "frameshift": [None, None, FRAMESHIFT],
                "segment_length": -1,
            },
            "save_checkpoint_dir": f"{tmpdir}/ckpt_am",
            "training_steps": 10,
            "iters_per_checkpoint": 5,
            "save_features": [["embedding", ".npy", None], ["wav", ".wav", 1600]],
        }
    )


def tiny_emb_config(tmpdir: str) -> Config:
    """QS-TTS synthesizer: 12-dim 'SSL' embeddings + pitch/energy + mel,
    adversarial prosody estimator, ECAPA global encoder."""
    return Config(
        {
            "id": "tiny_emb",
            "task": {
                "_name": "MSMCTTS",
                "_mode": "train_autoencoder",
                "autoencoder": {
                    "_name": "MSMCVQGANEmb",
                    "emb_dim": 12,
                    "n_model_size": 16,
                    "pitch_dim": 1,
                    "energy_dim": 1,
                    "mel_dim": MEL_DIM,
                    "pred_mel": True,
                    "encoder_config": {
                        "downsample_scales": [1, 2],
                        "max_seq_len": 64,
                        "n_layers": 1,
                        "n_head": 2,
                        "d_k": 8,
                        "d_v": 8,
                        "d_inner": 32,
                        "dropout": 0.1,
                        "attn_dropout": 0.0,
                    },
                    "quantizer_config": {
                        "embedding_sizes": 8,
                        "embedding_dims": 16,
                        "n_heads": 2,
                        "prior_config": {
                            "kernel_size": 3,
                            "dilation_rate": 1,
                            "n_layers": 1,
                        },
                    },
                    "global_encoder_config": {"_name": "ECAPA_TDNN"},
                    "decoder_config": {
                        "upsample_rates": [2, 2],
                        "upsample_kernel_sizes": [4, 4],
                        "upsample_initial_channel": 16,
                        "resblock_kernel_sizes": [3],
                        "resblock_dilation_sizes": [[1, 3]],
                    },
                },
                "prosody_estimator": {
                    "_name": "AttrPredictor",
                    "in_channels": 16,
                    "out_channels": 2,
                    "kernel_size": 3,
                    "n_layers": 1,
                },
                "discriminator": {
                    "_name": "UnivNetDiscriminator",
                    "mrd_config": {
                        "hop_lengths": [4, 8],
                        "hidden_channels": [32, 32],
                        "domain": "double",
                        "mel_scale": True,
                        "sample_rate": 1600,
                    },
                    "mpd_config": {"periods": [2, 3], "channels": 4, "max_channels": 16},
                },
            },
            "trainer": {
                "_name": "EmbVQGANTrainer",
                "grad_clip_thresh": 1.0,
                "frame_loss_supervised_step": 1,
                "stft_loss_supervised_step": 1,
                "sample_batch_size": 2,
                "sample_lengths": 32,
                "lambda_vq": 1,
                "lambda_pr": 0.1,
                "lambda_frame": 10,
                "lambda_fm": 2,
                "lambda_stft": 4.5,
                "stft_loss_config": {
                    "fft_size": 64,
                    "hop_size": 16,
                    "win_size": 64,
                    "num_mels": 8,
                },
            },
            "optimizer": {
                "_default": {
                    "_name": "AdamW",
                    "learning_rate": 2e-4,
                    "betas": [0.8, 0.99],
                    "eps": 1e-8,
                    "weight_decay": 0.0,
                }
            },
            "dataloader": {"batch_size": 4, "num_workers": 0},
            "dataset": {
                "_name": "EmbDataset",
                "id_list": f"{tmpdir}/train.list",
                "samplerate": 1600,
                "feature": ["emb", "pitch", "energy", "mel", "wav"],
                "feature_path": [
                    f"{tmpdir}/emb/{{}}.npy",
                    f"{tmpdir}/pitch/{{}}.npy",
                    f"{tmpdir}/energy/{{}}.npy",
                    f"{tmpdir}/mel/{{}}.npy",
                    f"{tmpdir}/wav/{{}}.wav",
                ],
                "dimension": [12, 1, 1, MEL_DIM, 1],
                "frameshift": [FRAMESHIFT, FRAMESHIFT, FRAMESHIFT, FRAMESHIFT, 1],
                "padding_value": [0, 0, 0, -4, 0],
                "segment_length": -1,
            },
            "save_checkpoint_dir": f"{tmpdir}/ckpt_emb",
            "training_steps": 10,
            "iters_per_checkpoint": 5,
        }
    )


def write_tiny_emb_dataset(tmpdir: str, n_utts: int = 6, seed: int = 0):
    """emb/pitch/energy/mel/wav corpus for the QS-TTS tiny recipe."""
    import os

    from msmctts_tpu.data.datasets import save_wav

    rng = np.random.default_rng(seed)
    for sub in ("emb", "pitch", "energy", "mel", "wav"):
        os.makedirs(f"{tmpdir}/{sub}", exist_ok=True)
    ids = []
    phone_lines, dur_lines = [], []
    for i in range(n_utts):
        uid = f"utt{i:03d}"
        ids.append(uid)
        n_phones = int(rng.integers(4, 8))
        durs = rng.integers(2, 6, size=n_phones)
        frames = int(durs.sum())
        phones = rng.integers(1, 20, size=n_phones)
        tones = rng.integers(0, 5, size=n_phones)
        phone_lines.append(
            uid + "|" + " ".join(f"{p}_{t}" for p, t in zip(phones, tones))
        )
        dur_lines.append(uid + "|" + " ".join(str(d) for d in durs))
        np.save(f"{tmpdir}/emb/{uid}.npy", rng.normal(size=(frames, 12)).astype(np.float32))
        np.save(f"{tmpdir}/pitch/{uid}.npy", rng.normal(size=(frames, 1)).astype(np.float32))
        np.save(f"{tmpdir}/energy/{uid}.npy", rng.normal(size=(frames, 1)).astype(np.float32))
        np.save(f"{tmpdir}/mel/{uid}.npy", rng.normal(size=(frames, MEL_DIM)).astype(np.float32))
        save_wav(
            f"{tmpdir}/wav/{uid}.wav",
            (rng.normal(size=frames * FRAMESHIFT) * 0.1).astype(np.float32),
            1600,
        )
    with open(f"{tmpdir}/train.list", "w") as f:
        f.write("\n".join(ids) + "\n")
    with open(f"{tmpdir}/phone.txt", "w") as f:
        f.write("\n".join(phone_lines) + "\n")
    with open(f"{tmpdir}/dur.txt", "w") as f:
        f.write("\n".join(dur_lines) + "\n")
    return ids


def write_tiny_dataset(tmpdir: str, n_utts: int = 6, seed: int = 0):
    """Synthetic mel/wav/text/dur corpus matching the tiny configs."""
    import os

    from msmctts_tpu.data.datasets import save_wav

    rng = np.random.default_rng(seed)
    os.makedirs(f"{tmpdir}/mel", exist_ok=True)
    os.makedirs(f"{tmpdir}/wav", exist_ok=True)
    ids = []
    phone_lines, dur_lines = [], []
    for i in range(n_utts):
        uid = f"utt{i:03d}"
        ids.append(uid)
        n_phones = int(rng.integers(4, 9))
        durs = rng.integers(2, 6, size=n_phones)
        frames = int(durs.sum())
        mel = rng.normal(size=(frames, MEL_DIM)).astype(np.float32)
        wav = rng.normal(size=frames * FRAMESHIFT).astype(np.float32) * 0.1
        np.save(f"{tmpdir}/mel/{uid}.npy", mel)
        save_wav(f"{tmpdir}/wav/{uid}.wav", wav, 1600)
        phones = rng.integers(1, 20, size=n_phones)
        tones = rng.integers(0, 5, size=n_phones)
        phone_lines.append(
            uid + "|" + " ".join(f"{p}_{t}" for p, t in zip(phones, tones))
        )
        dur_lines.append(uid + "|" + " ".join(str(d) for d in durs))
    with open(f"{tmpdir}/train.list", "w") as f:
        f.write("\n".join(ids) + "\n")
    with open(f"{tmpdir}/phone.txt", "w") as f:
        f.write("\n".join(phone_lines) + "\n")
    with open(f"{tmpdir}/dur.txt", "w") as f:
        f.write("\n".join(dur_lines) + "\n")
    return ids
