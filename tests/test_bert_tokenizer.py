"""Wordpiece tokenizer tests against a synthetic vocab, cross-checked with
transformers' BertTokenizer when the same vocab file is loaded."""

import numpy as np
import pytest

from t2v_turbo_tpu.utils.bert_tokenizer import BertWordPieceTokenizer

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "a", "cat", "dog", "runs", "run", "##s", "##ning", "the", "un",
    "##believ", "##able", "!", ",", "ca", "##t",
]


@pytest.fixture()
def vocab_file(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


class TestWordPiece:
    def test_basic(self, vocab_file):
        tok = BertWordPieceTokenizer(vocab_file, max_length=10)
        ids, mask = tok("a cat runs!")
        v = {t: i for i, t in enumerate(VOCAB)}
        expected = [v["[CLS]"], v["a"], v["cat"], v["runs"], v["!"], v["[SEP]"]]
        assert ids[0, : len(expected)].tolist() == expected
        assert mask[0].sum() == len(expected)
        assert (ids[0, len(expected):] == v["[PAD]"]).all()

    def test_wordpiece_continuation(self, vocab_file):
        tok = BertWordPieceTokenizer(vocab_file, max_length=10)
        v = {t: i for i, t in enumerate(VOCAB)}
        assert tok.encode("unbelievable") == [v["un"], v["##believ"], v["##able"]]
        assert tok.encode("running") == [v["run"], v["##ning"]]

    def test_unknown(self, vocab_file):
        tok = BertWordPieceTokenizer(vocab_file, max_length=10)
        assert tok.encode("zzzqqq") == [tok.unk_id]

    def test_lowercase_and_accents(self, vocab_file):
        tok = BertWordPieceTokenizer(vocab_file, max_length=10)
        assert tok.encode("CÀT") == tok.encode("cat")

    def test_truncation(self, vocab_file):
        tok = BertWordPieceTokenizer(vocab_file, max_length=6)
        ids, mask = tok("a cat a cat a cat a cat")
        assert ids.shape == (1, 6)
        assert ids[0, -1] == tok.sep_id  # SEP survives truncation

    def test_matches_transformers(self, vocab_file):
        transformers = pytest.importorskip("transformers")
        hf = transformers.BertTokenizer(
            vocab_file, do_lower_case=True, model_max_length=10
        )
        tok = BertWordPieceTokenizer(vocab_file, max_length=10)
        for text in ["a cat runs!", "unbelievable, a dog", "running cats", "zzz"]:
            ours = tok.encode(text)
            theirs = hf.convert_tokens_to_ids(hf.tokenize(text))
            assert ours == theirs, (text, ours, theirs)

    def test_missing_vocab(self):
        with pytest.raises(FileNotFoundError):
            BertWordPieceTokenizer("/definitely/missing/vocab.txt")
