from ifctordf_ray import schema as S


def test_iri_minting_deterministic():
    assert S.conv_iri("c1-0") == "inst:conv/c1-0"
    assert S.turn_iri("c1-0", 3) == "inst:turn/c1-0/3"
    assert S.text_wrapper_iri("abc") == S.text_wrapper_iri("abc")
    assert S.text_wrapper_iri("abc") != S.text_wrapper_iri("abd")
    # verbatim lexical contract: '0012' and '12' are distinct wrappers
    assert S.num_wrapper_iri("0012") != S.num_wrapper_iri("12")


def test_expand_curie():
    assert S.expand_curie("rdf:type").startswith("http://www.w3.org/1999")
    assert S.expand_curie("inst:turn/c/0") == "https://w3id.org/conv/inst/turn/c/0"
    assert S.expand_curie("nosuch:x") == "nosuch:x"


def test_first_seen_key_orders_like_sql_printf():
    # must sort identically to printf('%s#%010d', conv_id, turn_idx)
    assert S.first_seen_key("a", 2) < S.first_seen_key("a", 10)
    assert S.first_seen_key("a", 99) < S.first_seen_key("b", 0)
