"""CLAP query encoder facade — the reference CLAP_Encoder API
(models/clap_encoder.py:93-106): ``get_query_embed(modality, audio=, text=,
use_text_ratio=)`` -> (B, 512) normalized conditioning vectors.

- text path: host BPE tokenize -> jitted (RoBERTa + text_projection +
  normalize). The reference's batch-of-1 doubling hack
  (clap_encoder.py:79-88) is unnecessary here and intentionally absent.
- audio path: resample to 48 kHz + HTSAT + audio_projection (wired in once
  the HTSAT port lands; raises cleanly until then).
- 'hybird' [sic — reference spelling kept for API parity]: per-call coin
  flip against use_text_ratio, host-side RNG seeded explicitly (replaces
  the reference's global random.seed(batch_idx)).
- The reference audio path embeds only the FIRST item due to a
  return-inside-loop bug (clap_encoder.py:74-76, latent because baseline
  use_text_ratio=1.0); we do NOT reproduce that bug (SURVEY.md §7 quirk 7).
"""
from __future__ import annotations

import logging
from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("lass_tpu.query_encoder")

from lass_tpu.models.clap.model import CLAPTextEncoder
from lass_tpu.models.clap.roberta import RobertaConfig
from lass_tpu.models.clap.tokenizer import (
    RobertaBPETokenizer, WhitespaceFallbackTokenizer)


class CLAPQueryEncoder:
    encoder_type = "CLAP"

    def __init__(
        self,
        text_params: Optional[Any] = None,
        tokenizer: Optional[Callable] = None,
        roberta_cfg: RobertaConfig = RobertaConfig(),
        joint_embed_dim: int = 512,
        max_length: int = 512,
        pad_to: Optional[int] = 64,
        audio_embed_fn: Optional[Callable] = None,
        rng_seed: int = 0,
        tmodel: str = "roberta",
        text_cfg: Optional[Any] = None,
        text_embed_cache: int = 4096,
    ):
        """tmodel selects the text branch + its host tokenizer, mirroring
        the reference's --tmodel / per-branch tokenizer selection
        (CLAP training/data.py tokenizer choice, open_clip/bert.py:1-31):
        'roberta' (default, byte-BPE), 'bert' (WordPiece, vocab via
        LASS_TPU_BERT_VOCAB), 'bart' (byte-BPE, vocab via
        LASS_TPU_BART_VOCAB_DIR). text_cfg overrides the branch config
        (BertConfig/BartConfig) for non-roberta branches.

        text_embed_cache: per-caption LRU over the text branch (entries;
        0 disables). The encoder is FROZEN in AudioSep training (the
        reference never backprops through CLAP, clap_encoder.py:29-33),
        so a caption's embedding is a pure function of the string:
        tokenization is per-caption, transformer rows are batch-
        independent, and the encoder is padding-invariant (masked
        attention + masked pooling) — assembling a batch from cached
        rows equals recomputing: bit-exact when the batches land in the
        same ``pad_to`` bucket (the common case; pinned in
        tests/test_query_encoder.py), and within mask-invariance
        tolerance (~1e-6, same as test_single_caption_no_doubling_hack)
        when a long caption bumps a batch to a larger bucket. Real corpora repeat
        captions tens of times across an epoch; with the cache warm the
        per-step conditioning cost drops to a 32 KB host stack, which is
        what lets sustained wall-clock training track the in-jit rate
        (bench.py train_sustained_*)."""
        self.tmodel = tmodel
        if tmodel == "roberta":
            self.text_model = CLAPTextEncoder(roberta_cfg, joint_embed_dim)
        elif tmodel == "bert":
            from lass_tpu.models.clap.model import CLAPBertTextEncoder

            self.text_model = CLAPBertTextEncoder(text_cfg, joint_embed_dim)
        elif tmodel == "bart":
            from lass_tpu.models.clap.model import CLAPBartTextEncoder

            self.text_model = CLAPBartTextEncoder(text_cfg, joint_embed_dim)
        else:
            raise ValueError(f"tmodel must be roberta/bert/bart, "
                             f"got {tmodel!r}")
        self.has_pretrained_text = text_params is not None
        if text_params is None:
            dummy = jnp.zeros((1, 8), jnp.int32)
            text_params = self.text_model.init(
                jax.random.PRNGKey(0), dummy, jnp.ones_like(dummy))["params"]
            logger.warning(
                "CLAPQueryEncoder built WITHOUT pretrained text weights — "
                "conditioning embeddings are random-init %s. Training "
                "or evaluating against these is meaningless; load a "
                "converted CLAP pack (CLAPQueryEncoder.from_npz / "
                "scripts/convert_checkpoint.py --kind clap).", tmodel)
        self.text_params = text_params
        if tokenizer is None:
            tokenizer = self._default_tokenizer(roberta_cfg)
        self.tokenizer = tokenizer
        self.using_fallback_tokenizer = isinstance(
            tokenizer, WhitespaceFallbackTokenizer)
        self.max_length = max_length
        self.pad_to = pad_to
        self.audio_embed_fn = audio_embed_fn
        self._rng = np.random.default_rng(rng_seed)
        self._jit_text = jax.jit(
            lambda params, ids, mask: self.text_model.apply(
                {"params": params}, ids, mask))
        from collections import OrderedDict

        self._embed_cache_size = int(text_embed_cache)
        self._embed_cache: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self.embed_cache_hits = 0
        self.embed_cache_misses = 0

    def _default_tokenizer(self, roberta_cfg) -> Callable:
        from lass_tpu.models.clap.tokenizer import (
            BartBPETokenizer, WordPieceTokenizer)

        cls = {"roberta": RobertaBPETokenizer,
               "bert": WordPieceTokenizer,
               "bart": BartBPETokenizer}[self.tmodel]
        try:
            return cls()
        except FileNotFoundError as exc:
            logger.warning(
                "%s vocab assets not found (%s) — falling back to the "
                "hash-bucket whitespace tokenizer. Token ids will NOT "
                "match the reference tokenizer; supply the vocab or pass "
                "tokenizer= explicitly.", self.tmodel, exc)
            # bert-base vocab is 30522; keep fallback ids in range
            size = 30522 if self.tmodel == "bert" else roberta_cfg.vocab_size
            return WhitespaceFallbackTokenizer(size)

    @classmethod
    def from_npz(cls, path: str, htsat_cfg: Optional[Any] = None,
                 **kwargs) -> "CLAPQueryEncoder":
        """Build from a converted CLAP parameter pack
        (scripts/convert_checkpoint.py --kind clap): wires the text branch
        and, when present, the HTSAT audio branch."""
        import jax.numpy as jnp_

        from lass_tpu.convert.checkpoint_io import load_npz_variables

        pack = load_npz_variables(path)
        text_params = jax.tree_util.tree_map(
            jnp_.asarray, pack["text"]["params"])
        enc = cls(text_params=text_params, **kwargs)
        if "audio" in pack:
            audio_vars = {
                "params": jax.tree_util.tree_map(
                    jnp_.asarray, pack["audio"]["params"]),
                "batch_stats": jax.tree_util.tree_map(
                    jnp_.asarray, pack["audio"]["batch_stats"]),
            }
            enc.attach_audio_encoder(audio_params=audio_vars,
                                     htsat_cfg=htsat_cfg)
        return enc

    # -- modality paths ---------------------------------------------------
    def _embed_text_batch(self, texts: Sequence[str]) -> jax.Array:
        tok = self.tokenizer(texts, max_length=self.max_length,
                             pad_to=self.pad_to)
        return self._jit_text(self.text_params,
                              jnp.asarray(tok["input_ids"]),
                              jnp.asarray(tok["attention_mask"]))

    def _get_text_embed(self, texts: Sequence[str]) -> jax.Array:
        cache = self._embed_cache
        if not self._embed_cache_size:
            return self._embed_text_batch(texts)
        if all(t in cache for t in texts):
            self.embed_cache_hits += 1
            rows = [cache[t] for t in texts]
            for t in texts:  # refresh LRU order
                cache.move_to_end(t)
            return jnp.asarray(np.stack(rows))
        # miss: embed the WHOLE batch (keeps one jit shape per batch size
        # instead of one per miss-count) and cache every row
        self.embed_cache_misses += 1
        out = self._embed_text_batch(texts)
        rows = np.asarray(jax.device_get(out))
        for t, row in zip(texts, rows):
            cache[t] = row
            cache.move_to_end(t)
        while len(cache) > self._embed_cache_size:
            cache.popitem(last=False)
        return out

    def _get_audio_embed(self, audio: jax.Array) -> jax.Array:
        if self.audio_embed_fn is None:
            raise NotImplementedError(
                "audio query path requires the HTSAT encoder "
                "(pass audio_embed_fn or use attach_audio_encoder)")
        return self.audio_embed_fn(audio)

    def attach_audio_encoder(self, audio_params: Optional[Any] = None,
                             htsat_cfg: Optional[Any] = None,
                             sampling_rate: int = 32000,
                             clip_samples: int = 480000) -> None:
        """Wire the CLAP audio branch (HTSAT + audio_projection): (B, L) at
        ``sampling_rate`` -> resample to 48 kHz on device
        (clap_encoder.py:59-61) -> repeatpad/crop to clip_samples
        (training/data.py:451-563) -> normalized (B, 512).

        Embeds the WHOLE batch (the reference embeds only item 0 due to its
        return-inside-loop bug, clap_encoder.py:74-76)."""
        import numpy as np

        from lass_tpu.audio.resample import resample
        from lass_tpu.models.clap.audio_features import (
            prepare_audio_batch, prepare_audio_fusion)
        from lass_tpu.models.clap.model import CLAPAudioEncoder

        encoder = CLAPAudioEncoder(htsat_cfg=htsat_cfg)
        fusion = bool(getattr(htsat_cfg, "enable_fusion", False))
        if fusion:
            mel_cfg = htsat_cfg.mel
            chunk_frames = clip_samples // mel_cfg.hop_length + 1
            if audio_params is None:
                dummy_mel = jnp.zeros((1, 4, chunk_frames, mel_cfg.n_mels))
                audio_params = encoder.init(
                    jax.random.PRNGKey(0), mel_fusion=dummy_mel,
                    longer=jnp.zeros((1,), bool))

            @jax.jit
            def embed_fusion(variables, mel_fusion, longer):
                return encoder.apply(variables, mel_fusion=mel_fusion,
                                     longer=longer)

            def audio_embed_fn(audio):
                wave = np.asarray(audio, np.float32)
                if wave.ndim == 3:  # (B, 1, L)
                    wave = wave[:, 0]
                wave48 = np.asarray(resample(jnp.asarray(wave),
                                             sampling_rate, 48000))
                mels, longer = [], []
                for w in wave48:
                    m, lg, _ = prepare_audio_fusion(w, clip_samples,
                                                    mel_cfg=mel_cfg)
                    mels.append(m)
                    longer.append(lg)
                return embed_fusion(audio_params,
                                    jnp.asarray(np.stack(mels)),
                                    jnp.asarray(np.asarray(longer)))

            self.audio_embed_fn = audio_embed_fn
            return

        if audio_params is None:
            dummy = jnp.zeros((1, clip_samples))
            audio_params = encoder.init(jax.random.PRNGKey(0), dummy)

        @jax.jit
        def embed(variables, wave48):
            return encoder.apply(variables, wave48)

        def audio_embed_fn(audio):
            wave = np.asarray(audio, np.float32)
            if wave.ndim == 3:  # (B, 1, L)
                wave = wave[:, 0]
            wave48 = np.asarray(resample(jnp.asarray(wave), sampling_rate,
                                         48000))
            wave48 = prepare_audio_batch(wave48, clip_samples)
            return embed(audio_params, jnp.asarray(wave48))

        self.audio_embed_fn = audio_embed_fn

    # -- reference API ----------------------------------------------------
    def get_query_embed(self, modality: str,
                        audio: Optional[jax.Array] = None,
                        text: Optional[Sequence[str]] = None,
                        text_neg: Optional[Sequence[str]] = None,
                        use_text_ratio: float = 0.5,
                        seed: Optional[int] = None):
        """text_neg (the neg-query variant, reference
        'clap_encoder with_neg_query.py':93-125): returns the (pos, neg)
        embedding pair for the task's TRAINABLE fusion layer
        (lass_tpu.tasks.audiosep_variants.NegQueryFusion) — unlike the
        reference, whose lazily-created fusion Linear is untrained and
        unsaved (:128-143)."""
        if modality == "text" and text_neg is not None:
            return (self._get_text_embed(text),
                    self._get_text_embed(text_neg))
        if modality == "text":
            return self._get_text_embed(text)
        if modality == "audio":
            return self._get_audio_embed(audio)
        if modality == "hybird":  # reference spelling, clap_encoder.py:98
            rng = np.random.default_rng(seed) if seed is not None \
                else self._rng
            if rng.random() > use_text_ratio:
                return self._get_audio_embed(audio)
            return self._get_text_embed(text)
        raise NotImplementedError(f"modality '{modality}'")
