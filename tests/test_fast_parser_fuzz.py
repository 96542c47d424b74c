"""Hypothesis fuzz: the fast HTML tokenizer must NEVER diverge from the
stdlib parser on extraction output — its fallback guards have to catch
every construct it doesn't model."""

from hypothesis import given, settings
from hypothesis import strategies as st

from bbcrawl_ray.functions.htmldom import parse_html_fast, parse_html_stdlib
from bbcrawl_ray.stages.parse import extract_spans

_ALPHABET = "abc <>=\"'/!-imgsrcvideopst._?&;#x123\n\t"

fragments = st.lists(
    st.one_of(
        st.text(_ALPHABET, max_size=12),
        st.sampled_from(
            [
                '<img src="/a.jpg">',
                "<img src=b.png >",
                "<video src='/v.mp4'>",
                "<source src=/s.webm>",
                "</video>",
                "<div id=\"posts\">",
                "<div id='post_1'>",
                "<a id=attachment1 href=/f.zip>",
                "</a>",
                "</div>",
                "<!-- c -->",
                "<p>",
                "</p>",
                "text & more",
                "&amp;",
                "<",
                ">",
                '"',
                "<script>var x=1;</script>",
                "<img src=a.jpg/>",
                "<div id=x/>",
                "<!-- a > b --  >",
                "<!-- bad --!>",
                "<![CDATA[ <x> ]]>",
                "<!DOCTYPE html>",
                "<o:p/>",
                "<a 1=2>",
                "<div =x/>",
                "<a href=/f.zip/>",
            ]
        ),
    ),
    max_size=12,
)


@given(fragments)
@settings(max_examples=300, deadline=None)
def test_fast_parser_never_diverges(parts):
    html = "".join(parts)
    url = "http://h.example/page"
    fast = [
        (s.kind, s.text, s.media_ref) for s in extract_spans(url, parse_html_fast(html))
    ]
    std = [
        (s.kind, s.text, s.media_ref)
        for s in extract_spans(url, parse_html_stdlib(html))
    ]
    assert fast == std, html
