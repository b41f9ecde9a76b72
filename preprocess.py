"""CLI: dataset preprocessing (mirrors reference preprocess.py:101-229).

Usage: python preprocess.py --path /data/LJSpeech-1.1 --config configs/singlespeaker.yaml
"""

import argparse

from forwardtacotron_tpu.data.preprocess import run_preprocessing
from forwardtacotron_tpu.utils.files import read_config


def main():
    parser = argparse.ArgumentParser(description='Preprocess a TTS dataset')
    parser.add_argument('--path', required=True,
                        help='directory containing wav files and metadata')
    parser.add_argument('--config', default='configs/singlespeaker.yaml')
    parser.add_argument('--metafile', default='metadata.csv')
    parser.add_argument('--num_workers', type=int, default=4)
    args = parser.parse_args()

    config = read_config(args.config)
    run_preprocessing(config, dataset_path=args.path,
                      metafile=args.metafile, n_workers=args.num_workers)


if __name__ == '__main__':
    main()
