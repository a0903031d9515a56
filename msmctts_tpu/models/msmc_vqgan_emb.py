"""QS-TTS embedding-input VQ-GAN family (MSMCVQGANEmb, KMeansVQGANEmb).

Implemented later in the build; reconstructed from the reference spec
(vqgantts/msmc_vqgan_emb.py, broken at reference HEAD — SURVEY.md 2.3).
"""
