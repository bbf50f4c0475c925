"""usdm-tpu: a TPU-native (JAX/XLA/Pallas) spoken-dialog framework.

A from-scratch rebuild of the capabilities of USDM (naver-ai/usdm, NeurIPS
2024): speech tokenizer (XLS-R + k-means units), a Mistral-7B speech-text LLM
with a three-stage unit->text->text->unit dialog chain, the token-Voicebox
conditional-flow-matching mel generator, and the BigVGAN vocoder — all running
on TPU with jit/pjit-sharded compute, Pallas kernels on the hot paths, and a
paged-KV decode engine.

Subpackages
-----------
core    : configs, device mesh / sharding helpers, tokenizer, checkpointing
ops     : Pallas kernels + jnp reference ops (attention, STFT, sampling)
audio   : DSP — mel spectrograms, unit resampling/mode-pooling, wav IO
models  : mistral (LLM), voicebox (CFM), bigvgan (vocoder), xlsr (tokenizer)
engine  : KV-cache decode loop, 3-stage dialog policy, paged batching engine
train   : pjit FSDP LM trainer, SFT, LoRA, CFM trainer
data    : interleaver, FFD multipack packing, unit-mel dataset pipeline
"""

__version__ = "0.1.0"
