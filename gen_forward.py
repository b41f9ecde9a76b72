"""CLI: synthesize mels/wavs from text (mirrors reference gen_forward.py:14-117).

Loads a checkpoint (native msgpack or converted reference .pt — the config
travels inside), synthesizes each input sentence, and vocodes with
Griffin-Lim or exports mels for MelGAN (.mel via torch.save) / HiFiGAN
(.npy) vocoders.
"""

import argparse
from pathlib import Path

import numpy as np


def main():
    parser = argparse.ArgumentParser(description='Generate speech from text')
    parser.add_argument('--checkpoint', required=True,
                        help='path to a .ckpt (native) or .pt (reference) checkpoint')
    parser.add_argument('--input_text', default=None)
    parser.add_argument('--text_file', default='sentences.txt')
    parser.add_argument('--output', default='model_output')
    parser.add_argument('--alpha', type=float, default=1.0,
                        help='duration scale (speech speed)')
    parser.add_argument('--amp', type=float, default=1.0,
                        help='pitch amplification factor')
    parser.add_argument('--speaker', default=None,
                        help='speaker name for multispeaker checkpoints')
    parser.add_argument('--batched', action='store_true',
                        help='synthesize all sentences as one padded batch')
    parser.add_argument('--dtype', default='float32',
                        choices=['float32', 'bfloat16'],
                        help='bfloat16 = fused serving path (~2x throughput, '
                             'mel MAE ~1e-4 vs float32)')
    parser.add_argument('--data_parallel', action='store_true',
                        help='shard the batch over all visible devices')
    parser.add_argument('vocoder', nargs='?', default='griffinlim',
                        choices=['griffinlim', 'melgan', 'hifigan'])
    parser.add_argument('--vocoder_checkpoint', default=None,
                        help='published HiFi-GAN/MelGAN generator weights; '
                             'when given, vocoding runs on-device here '
                             '(JAX generators) and .wav files are written '
                             'instead of mel exports')
    parser.add_argument('--vocoder_config', default=None,
                        help='HiFi-GAN config.json for --vocoder_checkpoint '
                             '(v1 defaults if omitted)')
    args = parser.parse_args()

    from forwardtacotron_tpu.dsp.dsp import DSP
    from forwardtacotron_tpu.models.registry import is_multispeaker
    from forwardtacotron_tpu.models.synthesis import TTSInference
    from forwardtacotron_tpu.text.cleaners import Cleaner
    from forwardtacotron_tpu.text.tokenizer import Tokenizer
    from forwardtacotron_tpu.utils.checkpoints import \
        init_tts_model_from_checkpoint

    model, variables, checkpoint = init_tts_model_from_checkpoint(
        args.checkpoint)
    config = checkpoint['config']
    dsp = DSP.from_config(config)

    multispeaker = is_multispeaker(config)
    speaker_emb = None
    if multispeaker:
        embeddings = checkpoint.get('meta', {}).get('speaker_embeddings', {})
        if args.speaker and args.speaker in embeddings:
            speaker_emb = np.asarray(embeddings[args.speaker])
        elif embeddings:
            name, speaker_emb = next(iter(embeddings.items()))
            speaker_emb = np.asarray(speaker_emb)
            print(f'No --speaker given; using "{name}"')
        else:
            speaker_emb = np.zeros(256, np.float32)
            print('No speaker embeddings in checkpoint; using zeros')

    if args.input_text:
        sentences = [args.input_text]
    else:
        sentences = [line.strip() for line in
                     open(args.text_file, encoding='utf-8')
                     if line.strip()]

    try:
        cleaner = Cleaner.from_config(config)
    except RuntimeError:
        print('Phonemizer unavailable: treating input as pre-phonemized text')
        cleaner = Cleaner(config['preprocessing']['cleaner_name'],
                          use_phonemes=False,
                          lang=config['preprocessing']['language'])
    tokenizer = Tokenizer()
    mesh = None
    if args.data_parallel:
        from forwardtacotron_tpu.parallel.mesh import make_mesh
        mesh = make_mesh()
    inference = TTSInference(model, variables, multispeaker=multispeaker,
                             dtype=args.dtype, mesh=mesh)

    out_dir = Path(args.output)
    out_dir.mkdir(parents=True, exist_ok=True)

    def pitch_function(p):
        return p * args.amp

    kwargs = dict(alpha=args.alpha, pitch_function=pitch_function)
    if multispeaker:
        kwargs['speaker_emb'] = speaker_emb

    jitted_vocoder = None
    neural_vocoder = None
    if args.vocoder_checkpoint and args.vocoder in ('melgan', 'hifigan'):
        from forwardtacotron_tpu.models.synthesis import JittedVocoder
        voc_config = None
        if args.vocoder == 'hifigan' and args.vocoder_config:
            import json
            voc_config = json.loads(Path(args.vocoder_config).read_text())
        jitted_vocoder = JittedVocoder.from_checkpoint(
            args.vocoder_checkpoint, vocoder_type=args.vocoder,
            config=voc_config, dtype=args.dtype)

        def neural_vocoder(mel):  # [n_mels, T] log-mel -> waveform
            wav = jitted_vocoder(np.ascontiguousarray(mel.T)[None])
            return np.asarray(wav, np.float32)[0]

    wavs = None
    if args.batched and len(sentences) > 1:
        token_lists = [tokenizer(cleaner(s)) for s in sentences]
        max_n = max(len(t) for t in token_lists)
        x = np.zeros((len(token_lists), max_n), np.int64)
        for i, toks in enumerate(token_lists):
            x[i, :len(toks)] = toks
        # routed: each sentence decodes (and neural-vocodes) at its own frame
        # bucket instead of the longest sentence's (same outputs, less wasted
        # decode compute)
        out = inference.generate_routed(x, vocoder=jitted_vocoder, **kwargs)
        mels = [np.asarray(out['mel_post'], np.float32)[i, :int(out['mel_len'][i])].T
                for i in range(len(sentences))]
        if jitted_vocoder is not None:
            wavs = [np.asarray(out['wav'], np.float32)[i, :int(out['wav_len'][i])]
                    for i in range(len(sentences))]
    else:
        mels = []
        for sentence in sentences:
            x = np.asarray(tokenizer(cleaner(sentence)))
            out = inference.generate_cropped(x, **kwargs)
            mels.append(np.asarray(out['mel_post'], np.float32))

    for i, mel in enumerate(mels, 1):
        name = f'{i}_forward_{int(checkpoint["step"] / 1000)}k_alpha{args.alpha}'
        if args.vocoder == 'griffinlim':
            wav = dsp.griffinlim(mel)
            dsp.save_wav(wav, out_dir / f'{name}.wav')
        elif neural_vocoder is not None:
            wav = wavs[i - 1] if wavs is not None else neural_vocoder(mel)
            dsp.save_wav(wav, out_dir / f'{name}.wav')
        elif args.vocoder == 'melgan':
            import torch
            torch.save(torch.tensor(mel)[None, :, :], out_dir / f'{name}.mel')
        else:  # hifigan
            np.save(str(out_dir / f'{name}.npy'), mel, allow_pickle=False)
    print(f'Wrote {len(mels)} outputs to {out_dir}')


if __name__ == '__main__':
    main()
