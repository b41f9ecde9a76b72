"""Text stack tests: tokenizer round-trips, number normalization, cleaners."""

from forwardtacotron_tpu.text.cleaners import (Cleaner, collapse_whitespace,
                                               english_cleaners)
from forwardtacotron_tpu.text.numbers import (normalize_numbers,
                                              number_to_ordinal_words,
                                              number_to_words)
from forwardtacotron_tpu.text.symbols import (NUM_CHARS, phonemes,
                                              silent_phonemes_indices)
from forwardtacotron_tpu.text.tokenizer import Tokenizer


def test_symbol_table_matches_reference_id_space():
    assert NUM_CHARS == 135
    assert phonemes[0] == '_'
    assert silent_phonemes_indices == list(range(11))
    # spot-check stable IDs that checkpoints depend on
    assert phonemes[11] == '-'
    assert phonemes.index('a') == 36


def test_tokenizer_round_trip():
    tok = Tokenizer()
    text = 'həloʊ ðɛɹ!'
    ids = tok(text)
    assert tok.decode(ids) == text
    # unknown chars silently dropped
    assert tok.decode(tok('h€llo')) == 'hllo'


def test_number_to_words():
    assert number_to_words(0) == 'zero'
    assert number_to_words(14) == 'fourteen'
    assert number_to_words(42) == 'forty-two'
    assert number_to_words(100) == 'one hundred'
    assert number_to_words(1234) == 'one thousand, two hundred thirty-four'
    assert number_to_words(1000000) == 'one million'


def test_ordinals():
    assert number_to_ordinal_words(1) == 'first'
    assert number_to_ordinal_words(2) == 'second'
    assert number_to_ordinal_words(3) == 'third'
    assert number_to_ordinal_words(12) == 'twelfth'
    assert number_to_ordinal_words(21) == 'twenty-first'
    assert number_to_ordinal_words(30) == 'thirtieth'


def test_normalize_numbers():
    assert normalize_numbers('1,000 items') == 'one thousand items'
    assert normalize_numbers('$2.50') == 'two dollars, fifty cents'
    assert normalize_numbers('$1.00') == 'one dollar'
    assert normalize_numbers('£5') == 'five pounds'
    assert normalize_numbers('3.14') == 'three point fourteen'
    assert normalize_numbers('the 2nd time') == 'the second time'
    assert normalize_numbers('in 1985') == 'in nineteen eighty-five'
    assert normalize_numbers('in 2007') == 'in two thousand seven'
    assert normalize_numbers('in 1900') == 'in nineteen hundred'
    assert normalize_numbers('in 1905') == 'in nineteen oh five'


def test_english_cleaners():
    assert english_cleaners('Mr. Smith paid $5') == 'mister Smith paid five dollars'
    assert english_cleaners('café') == 'cafe'


def test_cleaner_no_phonemes():
    cleaner = Cleaner('english_cleaners', use_phonemes=False, lang='en-us')
    assert cleaner('  Dr.  Who   ') == 'doctor Who'
    assert collapse_whitespace('a  b\t c') == 'a b c'


def test_cleaner_from_config():
    config = {'preprocessing': {'cleaner_name': 'no_cleaners',
                                'use_phonemes': False, 'language': 'en-us'}}
    cleaner = Cleaner.from_config(config)
    assert cleaner('hello') == 'hello'


class RecordedEspeakBackend:
    """Replays phonemizer outputs recorded from the reference's espeak
    configuration so the use_phonemes=True pipeline (clean -> phonemize ->
    symbol-set filter -> whitespace collapse) is tested without the espeak
    shared library. Golden input/output pairs from the reference's own
    cleaner test (/root/reference/tests/test_cleaner.py:8-16); the extra
    entries exercise the filter on out-of-set characters."""

    RECORDED = {
        'hello there!': 'həloʊ ðɛɹ!',
        'hello there?!.': 'həloʊ ðɛɹ?!.',
        # language-switch flags and stray out-of-set chars that a real
        # espeak run can emit; the filter must drop them
        'mixed': 'həloʊ A1# ðɛɹ',
        'spaced': 'həloʊ   ðɛɹ',
    }

    def __init__(self):
        self.calls = []

    def phonemize(self, texts, strip=True):
        assert strip
        self.calls.extend(texts)
        return [self.RECORDED[t] for t in texts]


def test_cleaner_phonemize_path_with_recorded_backend():
    backend = RecordedEspeakBackend()
    cleaner = Cleaner('no_cleaners', use_phonemes=True, lang='en-us',
                      backend=backend)
    # reference golden round trips (tests/test_cleaner.py:11-15)
    assert cleaner('hello there!') == 'həloʊ ðɛɹ!'
    assert cleaner('hello there?!.') == 'həloʊ ðɛɹ?!.'
    assert backend.calls == ['hello there!', 'hello there?!.']

    # out-of-set characters are filtered AFTER phonemization
    from forwardtacotron_tpu.text.symbols import phonemes_set
    for bad in 'A1#':
        assert bad not in phonemes_set
    assert cleaner('mixed') == 'həloʊ ðɛɹ'
    # whitespace collapses after filtering
    assert cleaner('spaced') == 'həloʊ ðɛɹ'

    # cleaning runs BEFORE phonemization: english_cleaners would rewrite
    # the input key, so the recorded lookup proves the order
    backend2 = RecordedEspeakBackend()
    backend2.RECORDED = {'mister one': 'mɪstɚ wʌn'}
    cleaner2 = Cleaner('english_cleaners', use_phonemes=True, lang='en-us',
                       backend=backend2)
    assert cleaner2('Mr. 1') == 'mɪstɚ wʌn'
    assert backend2.calls == ['mister one']


def test_cleaner_phonemized_output_tokenizes_losslessly():
    """The recorded espeak outputs must round-trip through the tokenizer —
    the same contract the reference's 135-symbol ID space guarantees."""
    from forwardtacotron_tpu.text.tokenizer import Tokenizer
    tok = Tokenizer()
    for text in ('həloʊ ðɛɹ!', 'həloʊ ðɛɹ?!.', 'mɪstɚ wʌn'):
        assert tok.decode(tok(text)) == text
