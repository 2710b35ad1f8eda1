"""Citation rewriting vs hand-derived reference behavior
(markdown_generation_strategy.py:82-146 convert_links_to_citations)."""

from crawl4ai_spark.extraction.citations import convert_links_to_citations


def test_basic_link():
    md, refs = convert_links_to_citations("see [here](https://a.com/x) end")
    assert md == "see here⟨1⟩ end"
    assert refs == "\n\n## References\n\n⟨1⟩ https://a.com/x: here\n"


def test_numbering_by_first_occurrence_and_dedup():
    src = "[a](https://a.com) [b](https://b.com) [c](https://a.com)"
    md, refs = convert_links_to_citations(src)
    # same URL shares one number even under different link text;
    # desc comes from the FIRST occurrence
    assert md == "a⟨1⟩ b⟨2⟩ c⟨1⟩"
    assert refs == ("\n\n## References\n\n"
                    "⟨1⟩ https://a.com: a\n"
                    "⟨2⟩ https://b.com: b\n")


def test_image_rewrite_drops_url():
    md, refs = convert_links_to_citations("![pic](https://a.com/i.png) t")
    assert md == "![pic⟨1⟩] t"
    assert "⟨1⟩ https://a.com/i.png: pic" in refs


def test_title_and_text_description():
    src = '[go](https://a.com "Title") [Title2](https://b.com "Title2")'
    _, refs = convert_links_to_citations(src)
    # title first, text appended only when it differs from the title
    assert "⟨1⟩ https://a.com: Title - go\n" in refs
    assert "⟨2⟩ https://b.com: Title2\n" in refs


def test_relative_urls_join_base_before_dedup():
    src = "[a](/p) [b](https://s.com/p) [c](sub/q)"
    md, refs = convert_links_to_citations(src, base_url="https://s.com/dir/")
    # /p joins to https://s.com/dir/p per the reference's fast path
    # (base minus trailing slash + url), NOT RFC urljoin
    assert "⟨1⟩ https://s.com/dir/p: a\n" in refs
    assert "⟨2⟩ https://s.com/p: b\n" in refs
    assert "⟨3⟩ https://s.com/dir/sub/q: c\n" in refs
    assert md == "a⟨1⟩ b⟨2⟩ c⟨3⟩"


def test_absolute_schemes_pass_through():
    src = "[m](mailto:x@y.z) [p](//cdn.com/a)"
    _, refs = convert_links_to_citations(src, base_url="https://s.com")
    assert "⟨1⟩ mailto:x@y.z: m\n" in refs
    assert "⟨2⟩ //cdn.com/a: p\n" in refs


def test_no_links_still_emits_header():
    md, refs = convert_links_to_citations("plain text")
    assert md == "plain text"
    assert refs == "\n\n## References\n\n"
