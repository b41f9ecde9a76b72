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
