"""Metadata recipe tests: tempdir round-trips for the four formats
(reference tests/test_recipes.py pattern)."""

from pathlib import Path

from forwardtacotron_tpu.text.recipes import (read_ljspeech_format,
                                              read_metadata,
                                              read_pandas_format,
                                              read_vctk_format)


def test_ljspeech(tmp_path):
    meta = tmp_path / 'metadata.csv'
    meta.write_text('id1|some text\nid2|more|text with pipe\n',
                    encoding='utf-8')
    text, speaker = read_ljspeech_format(meta)
    assert text == {'id1': 'some text', 'id2': 'text with pipe'}
    assert set(speaker.values()) == {'default_speaker'}


def test_ljspeech_multi(tmp_path):
    meta = tmp_path / 'metadata.csv'
    meta.write_text('id1|spk_a|hello\nid2|spk_b|world\n', encoding='utf-8')
    text, speaker = read_ljspeech_format(meta, multispeaker=True)
    assert text == {'id1': 'hello', 'id2': 'world'}
    assert speaker == {'id1': 'spk_a', 'id2': 'spk_b'}


def test_vctk(tmp_path):
    for spk, utt, line in [('p225', 'p225_001', 'first line'),
                           ('p226', 'p226_001', 'other line')]:
        d = tmp_path / spk
        d.mkdir()
        (d / f'{utt}.txt').write_text(line + '\nsecond line ignored\n',
                                      encoding='utf-8')
    text, speaker = read_vctk_format(tmp_path, n_workers=1)
    assert text == {'p225_001': 'first line', 'p226_001': 'other line'}
    assert speaker == {'p225_001': 'p225', 'p226_001': 'p226'}


def test_pandas(tmp_path):
    meta = tmp_path / 'metadata.tsv'
    meta.write_text('file_id\tspeaker_id\ttext\n'
                    'id1\tspk_a\thello there\n', encoding='utf-8')
    text, speaker = read_pandas_format(meta)
    assert text == {'id1': 'hello there'}
    assert speaker == {'id1': 'spk_a'}


def test_read_metadata_dispatch(tmp_path):
    meta = tmp_path / 'metadata.csv'
    meta.write_text('id1|hello\n', encoding='utf-8')
    text, _ = read_metadata(Path(tmp_path), 'metadata.csv', 'ljspeech')
    assert text == {'id1': 'hello'}
    try:
        read_metadata(Path(tmp_path), 'metadata.csv', 'bogus')
        raise AssertionError('expected ValueError')
    except ValueError:
        pass
