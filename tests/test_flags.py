"""Flag-validator accept/reject parity, ported from cmdline/flags_test.go:12-198."""

import pytest

from bbcrawl_ray.cli import flags as F


def test_boolean():
    for k, v in {"true": True, "TRUE": True, "false": False, "FALSE": False}.items():
        assert F.parse_boolean(k) is v
    for bad in ["", "abc", "trve", "1", "0"]:
        with pytest.raises(F.FlagError):
            F.parse_boolean(bad)


def test_url_collection_roundtrip():
    inp = "https://www.google.com,ftp://example.com,relative/url/example.html"
    urls = F.parse_url_collection(inp)
    assert urls == inp.split(",")
    assert ",".join(urls) == inp


def test_single_url():
    assert F.parse_single_url("https://www.google.com") == "https://www.google.com"


def test_int_range():
    assert F.parse_int_range("3,3") == (3, 3)
    assert F.parse_int_range("23,42") == (23, 42)
    assert F.parse_int_range("-1,2") == (-1, 2)
    with pytest.raises(F.FlagError):
        F.parse_int_range("4,3")
    with pytest.raises(F.FlagError):
        F.parse_int_range("4")
    with pytest.raises(F.FlagError):
        F.parse_int_range("1,2,3")


def test_int_tuple():
    assert F.parse_int_tuple("24,1") == [24, 1]
    assert F.parse_int_tuple("-8, 3") == [-8, 3]
    with pytest.raises(F.FlagError):
        F.parse_int_tuple("a,b")


def test_fs_directory():
    assert F.parse_fs_directory("/var") == "/var"
    with pytest.raises(F.FlagError):
        F.parse_fs_directory("allyourbasearebelongtous")


def test_start_page():
    with pytest.raises(F.FlagError):
        F.parse_start_page("0")
    assert F.parse_start_page("23") == 23


def test_end_page():
    with pytest.raises(F.FlagError):
        F.parse_end_page("21", start=23)  # end < start
    assert F.parse_end_page("24", start=23) == 24
    with pytest.raises(F.FlagError):
        F.parse_end_page("0", start=23)


def test_attrs():
    inp = "test=high,low/style=height:20px;width:30px/numbers=1,2,3,4,5"
    a = F.parse_attrs(inp)
    assert len(a) == 3
    assert a["test"] == ["high", "low"]
    assert a["style"] == ["height:20px;width:30px"]
    assert len(a["numbers"]) == 5
    with pytest.raises(F.FlagError):
        F.parse_attrs("noequals")
    with pytest.raises(F.FlagError):
        F.parse_attrs("k=1/k=2")  # duplicate key


def test_string_whitelist():
    wl = ["audio", "img", "video"]
    assert F.parse_string_whitelist("img,video", wl) == ["img", "video"]
    with pytest.raises(F.FlagError):
        F.parse_string_whitelist("img,iframe", wl)


def test_go_atoi_strictness():
    with pytest.raises(F.FlagError):
        F.parse_int("1_0")
    with pytest.raises(F.FlagError):
        F.parse_int(" 1")
    assert F.parse_int("-42") == -42
    assert F.parse_int("+7") == 7
