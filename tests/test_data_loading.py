import pytest

from viquae_tpu.data import loading, sentencize


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    """Local WordPiece tokenizer (no network): chars + ## continuations."""
    from transformers import BertTokenizerFast

    letters = list("abcdefghijklmnopqrstuvwxyz0123456789")
    vocab = (
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
        + [f"word{i}" for i in range(300)]
        + ["hello", "world", "great", "entity", "word", "."]
        + letters
        + [f"##{c}" for c in letters]
    )
    d = tmp_path_factory.mktemp("tok")
    (d / "vocab.txt").write_text("\n".join(vocab))
    return BertTokenizerFast(vocab_file=str(d / "vocab.txt"), do_lower_case=True)


def test_answer_preprocess():
    assert loading.answer_preprocess("The Beatles!") == "beatles"
    assert loading.answer_preprocess("A  big   DOG.") == "big dog"
    assert loading.answer_preprocess("an apple") == "apple"


def test_remove_special_fields():
    paragraphs = [
        "Title paragraph",
        "Section::::Intro.",
        "Real text one. ",
        "BULLET::::- item",
        "Real text two.",
    ]
    assert loading.remove_special_fields(paragraphs) == [
        "Real text one. ", "Real text two."
    ]


def test_sentencize():
    text = "Dr. Smith went to Washington. He arrived at 5 p.m... It was late! Was it? Yes."
    sents = sentencize.sentences(text)
    assert sents[0] == "Dr. Smith went to Washington."
    assert "It was late!" in sents
    assert "Was it?" in sents
    assert sents[-1] == "Yes."


def test_uniform_passages_tokenizer(tokenizer):
    tok = tokenizer
    text = " ".join(f"word{i}" for i in range(250))
    passages = loading.uniform_passages([text], tok, n=100)
    assert len(passages) >= 3
    # each passage has <= 100 tokenizer tokens
    for p in passages:
        assert len(tok.tokenize(p)) <= 100


def test_uniform_passages_title(tokenizer):
    tok = tokenizer
    passages = loading.uniform_passages(
        ["hello world. " * 30], tok, n=20, title="Great Entity"
    )
    for p in passages:
        assert p.startswith("great entity [SEP] ")


def test_uniform_passages_of_sentences():
    sents = [f"Sentence number {i} has five tokens." for i in range(20)]
    text = " ".join(sents)
    passages = loading.uniform_passages_of_sentences([text], n=30)
    assert len(passages) > 1
    for p in passages:
        # sentence-preserving: every passage is whole sentences
        assert p.endswith(".")
    # order/content preserved
    assert "".join(passages).replace(" ", "") == text.replace(" ", "")


def test_uniform_sents_overlong_sentence():
    long_sent = "word " * 50 + "end."
    passages = loading.uniform_passages_of_sentences([long_sent], n=10)
    assert len(passages) == 1  # single over-long sentence kept whole


def test_map_if_not_None():
    out = loading.map_if_not_None(lambda x: x * 2, [1, None, 3])
    assert out == [2, None, 6]


def test_make_sentences_item():
    item = {"text": "First sentence here. Second one! Third?"}
    loading.make_sentences_item(item)
    assert len(item["sentences"]) == 3
    assert item["sentences"][0]["text"] == "First sentence here."
    assert item["sentences"][0]["n_tokens"] == 4
