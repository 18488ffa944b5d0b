from yoho_tpu.eval.wer import cer, edit_distance, normalize_for_wer, wer


def test_normalize():
    assert normalize_for_wer("Hello, World!") == "hello world"
    assert normalize_for_wer("it's  FINE.") == "it's fine"


def test_edit_distance_breakdown():
    st = edit_distance("a b c d".split(), "a x c".split())
    assert st.substitutions == 1  # b -> x
    assert st.deletions == 1  # d dropped
    assert st.insertions == 0
    assert st.hits == 2
    assert st.errors == 2


def test_wer_exact():
    rate, st = wer(["hello world"], ["Hello, world!"])
    assert rate == 0.0 and st.hits == 2


def test_wer_corpus():
    rate, st = wer(["the cat sat", "on the mat"],
                   ["the cat sat", "on a mat"])
    assert st.substitutions == 1
    assert abs(rate - 1 / 6) < 1e-9


def test_cer():
    rate, _ = cer(["abc"], ["axc"])
    assert abs(rate - 1 / 3) < 1e-9


def test_wer_insertion():
    rate, st = wer(["a b"], ["a x b"])
    assert st.insertions == 1 and st.hits == 2
    assert abs(rate - 0.5) < 1e-9


def test_evaluate_cli_collect(tmp_path):
    from yoho_tpu.cli.evaluate import collect_pairs

    (tmp_path / "x.wav").write_bytes(b"")
    (tmp_path / "x.txt").write_text("hello")
    pairs = collect_pairs(tmp_path)
    assert len(pairs) == 1 and pairs[0][1] == "hello"
