"""Notebook convenience: checkpoint -> speech in two lines
(reference notebook_utils/synthesize.py:11-49).

    synth = Synthesizer('checkpoints/ljspeech_tts.forward/latest_model.ckpt')
    wav = synth('Hello world!')
"""

from typing import Callable, Optional

import numpy as np

from forwardtacotron_tpu.dsp.dsp import DSP
from forwardtacotron_tpu.models.registry import is_multispeaker
from forwardtacotron_tpu.models.synthesis import TTSInference
from forwardtacotron_tpu.text.cleaners import Cleaner
from forwardtacotron_tpu.text.tokenizer import Tokenizer
from forwardtacotron_tpu.utils.checkpoints import \
    init_tts_model_from_checkpoint


def make_neural_vocoder(checkpoint_path: str, vocoder_type: str = 'hifigan',
                        config: Optional[dict] = None
                        ) -> Callable[[np.ndarray], np.ndarray]:
    """[n_mels, T] log-mel -> waveform callable backed by the JAX HiFi-GAN /
    MelGAN generators (models/vocoder.py) with published torch weights."""
    from forwardtacotron_tpu.utils.vocoder_checkpoints import (load_hifigan,
                                                               load_melgan)
    if vocoder_type == 'hifigan':
        model, variables = load_hifigan(checkpoint_path, config=config)
    elif vocoder_type == 'melgan':
        model, variables = load_melgan(checkpoint_path)
    else:
        raise ValueError(f'unknown vocoder_type: {vocoder_type}')

    def vocode(mel: np.ndarray) -> np.ndarray:
        batched = np.asarray(mel, np.float32).T[None]
        if vocoder_type == 'melgan':
            wav = model.apply(variables, batched, method=model.inference)
        else:
            wav = model.apply(variables, batched)
        return np.asarray(wav, np.float32)[0]

    return vocode


class Synthesizer:

    def __init__(self, checkpoint_path: str,
                 vocoder: Optional[Callable[[np.ndarray], np.ndarray]] = None,
                 vocoder_checkpoint: Optional[str] = None,
                 vocoder_type: str = 'hifigan',
                 vocoder_config: Optional[dict] = None) -> None:
        """``vocoder`` maps a [n_mels, T] log-mel to a waveform; defaults to
        Griffin-Lim. Alternatively pass ``vocoder_checkpoint`` (published
        HiFi-GAN/MelGAN generator weights, ``vocoder_type`` selects which)
        to vocode with the on-device JAX generators — the reference's
        notebook pulls a torch.hub MelGAN here instead
        (reference notebook_utils/synthesize.py:11-49)."""
        if vocoder is None and vocoder_checkpoint is not None:
            vocoder = make_neural_vocoder(vocoder_checkpoint, vocoder_type,
                                          vocoder_config)
        model, variables, checkpoint = init_tts_model_from_checkpoint(
            checkpoint_path)
        self.config = checkpoint['config']
        self.dsp = DSP.from_config(self.config)
        self.multispeaker = is_multispeaker(self.config)
        self.speaker_embeddings = checkpoint.get('meta', {}).get(
            'speaker_embeddings', {})
        self.inference = TTSInference(model, variables,
                                      multispeaker=self.multispeaker)
        try:
            self.cleaner = Cleaner.from_config(self.config)
        except RuntimeError:
            self.cleaner = Cleaner(
                self.config['preprocessing']['cleaner_name'],
                use_phonemes=False,
                lang=self.config['preprocessing']['language'])
        self.tokenizer = Tokenizer()
        self.vocoder = vocoder if vocoder is not None else self.dsp.griffinlim

    def __call__(self, text: str, alpha: float = 1.0,
                 pitch_amp: float = 1.0,
                 speaker: Optional[str] = None) -> np.ndarray:
        mel = self.synthesize_mel(text, alpha=alpha, pitch_amp=pitch_amp,
                                  speaker=speaker)
        return np.asarray(self.vocoder(mel))

    def synthesize_mel(self, text: str, alpha: float = 1.0,
                       pitch_amp: float = 1.0,
                       speaker: Optional[str] = None) -> np.ndarray:
        x = np.asarray(self.tokenizer(self.cleaner(text)))
        kwargs = {'alpha': alpha,
                  'pitch_function': lambda p: p * pitch_amp}
        if self.multispeaker:
            if speaker and speaker in self.speaker_embeddings:
                emb = np.asarray(self.speaker_embeddings[speaker])
            elif self.speaker_embeddings:
                emb = np.asarray(next(iter(self.speaker_embeddings.values())))
            else:
                emb = np.zeros(256, np.float32)
            kwargs['speaker_emb'] = emb
        return self.inference.generate_cropped(x, **kwargs)['mel_post']
