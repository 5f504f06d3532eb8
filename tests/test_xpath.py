"""XPath-subset selector engine (htmlsel.XPathSelector) — pure tests.

The port test mirrors the selector set of a real reference spider
(pyspiders-master spiders/123wonen_nl.py:62-205) against a
hand-written fixture page shaped like that site's detail markup.
"""

import pytest

from spider_ray.htmlsel import (
    XPathSelector,
    compile_selector,
    is_xpath,
    parse_html,
    select,
)

PAGE = """
<html><head>
  <meta property="og:url" content="https://example.test/woning/8841-kerkstraat-12">
  <title>123Wonen</title>
</head><body>
  <div><h1 class="panddetail-address-large">Kerkstraat 12, Utrecht</h1></div>
  <span class="hidden-xs"><div class="panddetail-price">&euro; 1.250,- p/m</div></span>
  <div class="pand-specs">
    <ul>
      <li><span>Woonoppervlakte</span><span>85 m2</span></li>
      <li><span>Slaapkamers</span><span>2 (3 kamers)</span></li>
      <li><span>Beschikbaarheid</span><span>vanaf 01-09-2026</span></li>
    </ul>
  </div>
  <div class="contentLayout panddetail-desc">
    Ruim appartement <b>met balkon</b> in het centrum.
  </div>
  <div class="gallery">
    <img class="photo" src="/img/1.jpg"><img class="photo" src="/img/2.jpg">
  </div>
</body></html>
"""


def test_port_123wonen_selector_set():
    root = parse_html(PAGE)
    # title: add_xpath("title", "//div/h1/text()")
    assert select(root, "//div/h1/text()")[0].strip().startswith("Kerkstraat")
    # external_id: //meta[@property='og:url']//@content
    (url,) = select(root, "//meta[@property='og:url']//@content")
    assert url.endswith("8841-kerkstraat-12")
    # address: //h1[@class='panddetail-address-large']/text()
    (addr,) = select(root, "//h1[@class='panddetail-address-large']/text()")
    assert addr.strip() == "Kerkstraat 12, Utrecht"
    # square_meters: //span[.='Woonoppervlakte']/following-sibling::span/text()
    (sqm,) = select(
        root, "//span[.='Woonoppervlakte']/following-sibling::span/text()"
    )
    assert sqm.split("m")[0].strip() == "85"
    # room_count: //div[@class='pand-specs']//span[.='Slaapkamers']
    #             /following-sibling::span/text()
    (rooms,) = select(
        root,
        "//div[@class='pand-specs']//span[.='Slaapkamers']"
        "/following-sibling::span/text()",
    )
    assert rooms.split("(")[0].strip() == "2"
    # rent: //span[@class='hidden-xs']/div[@class='panddetail-price']/text()
    (rent,) = select(
        root, "//span[@class='hidden-xs']/div[@class='panddetail-price']/text()"
    )
    assert rent.split(",")[0].strip() == "€ 1.250"
    # description: //div[@class='contentLayout panddetail-desc']//text() .getall()
    parts = select(root, "//div[@class='contentLayout panddetail-desc']//text()")
    joined = " ".join(p.strip() for p in parts if p.strip())
    assert joined == "Ruim appartement met balkon in het centrum."
    # availability label lookup
    (avail,) = select(
        root, "//span[.='Beschikbaarheid']/following-sibling::span/text()"
    )
    assert avail.split("vanaf")[-1].strip() == "01-09-2026"


def test_predicates_and_axes():
    root = parse_html(PAGE)
    assert select(root, "//img[contains(@src,'2.jpg')]/@src") == ["/img/2.jpg"]
    assert select(root, "//img[starts-with(@src,'/img/')][2]/@src") == ["/img/2.jpg"]
    assert select(root, "//li[last()]/span[1]/text()") == ["Beschikbaarheid"]
    assert select(root, "//li[contains(.,'Slaapkamers')]/span[2]/text()") == [
        "2 (3 kamers)"
    ]
    # parent axis
    (cls,) = select(root, "//img[1]/../@class")
    assert cls == "gallery"
    # preceding-sibling proximity order: [1] is the nearest
    assert select(
        root, "//span[.='85 m2']/preceding-sibling::span[1]/text()"
    ) == ["Woonoppervlakte"]
    # union
    out = select(root, "//h1/text() | //div[@class='panddetail-price']/text()")
    assert len(out) == 2
    # attribute existence predicate
    assert len(select(root, "//meta[@property]")) == 1
    # wildcard + child combinator
    assert select(root, "//div[@class='gallery']/*[1]/@src") == ["/img/1.jpg"]


def test_dispatch_and_compile_errors():
    assert is_xpath("//div/text()") and is_xpath("./span") and is_xpath("(//a)")
    assert not is_xpath("div.price::text") and not is_xpath("[data-x]")
    assert type(compile_selector("//div")).__name__ == "XPathSelector"
    assert type(compile_selector("div.price")).__name__ == "Selector"
    for bad in (
        "//div[count(a)=2]",          # unsupported function
        "//td/text()/preceding::i",   # text() not final
        "//text()/div",               # text() not final
        "//@href/div",                # @ followed by a non-parent step
        "concat(//a/text(),'x')",     # concat() unsupported
    ):
        with pytest.raises(ValueError):
            XPathSelector(bad)
    # r4 tier-5: nested path predicates now compile
    XPathSelector("//div[a/b='x']")
    XPathSelector("//li[span[contains(.,'Prezzo')]]/span[2]/text()")


def test_rules_dsl_takes_xpath():
    from spider_ray.rules import FieldRule, compile_rules
    import pyarrow as pa

    rules = [
        FieldRule(field="rent", source="body",
                  selector="//div[@class='panddetail-price']/text()",
                  get_num=True, thousand_separator=".", scale_separator=","),
        FieldRule(field="title", source="body", selector="//div/h1/text()"),
        FieldRule(field="photos", source="body",
                  selector="//img[@class='photo']/@src", select_all=True),
    ]
    fn = compile_rules(rules)
    out = fn(pa.table({"body": [PAGE, None]}))
    assert out["rent"][0].as_py() == 1250
    assert out["title"][0].as_py().strip().startswith("Kerkstraat")
    assert out["photos"][0].as_py() == ["/img/1.jpg", "/img/2.jpg"]
    assert out["rent"][1].as_py() is None


BELLERIVE_PAGE = """
<html><body>
  <ul class="liste-offres">
    <li><div><p class="lien-detail"><a href="/offre/101">voir</a></p></div></li>
    <li><div><p class="lien-detail"><a href="/offre/102">voir</a></p></div></li>
  </ul>
  <div class="pagelinks-next"><a href="/liste?page=2">suivant</a></div>
  <ul class="specs">
    <li><strong>Nombre de chambres :</strong> 3 </li>
    <li><strong>Nombre de pi&egrave;ces :</strong> 0 </li>
    <li><strong>Surface :</strong> 64 m2</li>
  </ul>
  <div class="description"><p>Bel appartement <em>lumineux</em>.</p>
    <p>Proche commerces.</p></div>
  <div class="avail"><span>Status</span><br>  Available from 01 Sep  <br>tail</div>
</body></html>
"""


def test_port_belleriveimmo_selector_set():
    """Second real-spider port (VERDICT r3 Next-round #8):
    pyspiders-master spiders/belleriveimmo_fr.py:42-98 verbatim —
    exercises following-sibling::text() with a [.!='0'] predicate, the
    r4 additions."""
    root = parse_html(BELLERIVE_PAGE)
    # listing loop: //ul[@class='liste-offres']/li//p[@class='lien-detail']/a/@href
    hrefs = select(
        root, "//ul[@class='liste-offres']/li//p[@class='lien-detail']/a/@href"
    )
    assert hrefs == ["/offre/101", "/offre/102"]
    # pagination: //div[@class='pagelinks-next']/a/@href
    assert select(root, "//div[@class='pagelinks-next']/a/@href") == [
        "/liste?page=2"
    ]
    # room_count: //li/strong[contains(.,'chambres')]/following-sibling::text()[.!='0']
    rooms = select(
        root,
        "//li/strong[contains(.,'chambres')]/following-sibling::text()[.!='0']",
    )
    assert [r.strip() for r in rooms] == ["3"]
    # the pieces row's value IS '0' after strip — the reference's
    # [.!='0'] gate keeps the raw ' 0 ' text node (whitespace differs),
    # mirroring why these spiders strip() after extract; assert the
    # exact-equality form drops it once normalized
    pieces = select(
        root,
        "//li/strong[contains(.,'pièce')]/following-sibling::text()",
    )
    assert [p.strip() for p in pieces] == ["0"]
    # description: //div[@class='description']//p//text()
    desc = " ".join(
        t.strip() for t in
        select(root, "//div[@class='description']//p//text()") if t.strip()
    )
    assert desc == "Bel appartement lumineux . Proche commerces."


def test_r4_axis_and_predicate_additions():
    root = parse_html(BELLERIVE_PAGE)
    # //br/following-sibling::text()[contains(.,'Available')] — the
    # corpus's most common sibling-text pattern (38 spiders, e.g.
    # premier_uk_com.py:173)
    (avail,) = select(
        root, "//br/following-sibling::text()[contains(.,'Available')]"
    )
    assert avail.strip() == "Available from 01 Sep"
    # contains(following-sibling::text(), s) element predicate
    # (premier_uk/belleriveimmo family): first following text sibling
    assert select(
        root, "//strong[contains(following-sibling::text(),'3')]/text()"
    ) == ["Nombre de chambres :"]
    # position() comparison (corpus: position()<2]/@href)
    assert select(
        root, "//ul[@class='liste-offres']/li[position()<2]//a/@href"
    ) == ["/offre/101"]
    assert select(root, "//ul[@class='specs']/li[position()>=2]/strong/text()") == [
        "Nombre de pièces :", "Surface :"
    ]
    # descendant-or-self:: explicit axis
    assert select(
        root, "//div[@class='description']/descendant-or-self::*[position()=1]"
    )[0].attrs.get("class") == "description"
    (em,) = select(root, "//p/descendant-or-self::em/text()")
    assert em == "lumineux"


HMRES_PAGE = """
<html><body>
  <h1 class="title">12 <span>Kings Road</span>, Newcastle</h1>
  <div class="properties">
    <div class="property-item border-box featured"><a href="/property/101">A</a></div>
    <div class="property-item border-box"><a href="/property/102">B</a></div>
    <div class="other-item"><a href="/property/999">X</a></div>
  </div>
  <span title="Property Id">ID 4711</span>
  <div class="title"><span>Stunning flat</span></div>
  <section id="property-content">
    <p>Two bed apartment. AVAILABLE NOW</p>
    <p>Fully Furnished throughout</p>
    <p>Close to <b>city centre</b></p>
  </section>
  <span title="Bedrooms">2</span>
  <span title="Bathrooms">1</span>
  <div class="property-image  zoom" data-image="/img/a.jpg"></div>
  <div class="property-image  zoom" data-image="/img/b.jpg"></div>
  <h3><span>Features</span></h3>
  <ul><li>Parking</li><li>Garden <em>south facing</em></li></ul>
  <div class="meta">&pound;795 pcm</div>
  <script>var mapOptions = {center: [54.97, -1.61]};</script>
</body></html>
"""


def test_port_hmresidential_selector_set():
    """Third real-spider port: pyspiders-master
    spiders/hmresidential_co_uk.py:64-215 verbatim — exercises the
    wildcard element test with contains(@class/@title), mid-path
    parent steps (..) chained into an ELEMENT-valued following-sibling
    axis, deep //text() after a string-value predicate, and
    text()[contains(.,s)] filters."""
    root = parse_html(HMRES_PAGE)
    # listing loop (line 64)
    assert select(
        root, './/*[contains(@class,"property-item border-box")]/a/@href'
    ) == ["/property/101", "/property/102"]
    # external_id (94) / bedrooms (119) / bathrooms (122)
    assert select(root, './/*[contains(@title,"Id")]/text()') == ["ID 4711"]
    assert select(root, './/*[contains(@title,"Bedroom")]/text()') == ["2"]
    assert select(root, './/*[contains(@title,"Bathroom")]/text()') == ["1"]
    # title span under ANY element with class="title" (95): matches the
    # h1 and the div, in document order
    assert select(root, './/*[@class="title"]//span/text()') == [
        "Kings Road", "Stunning flat",
    ]
    # description paragraphs (97)
    assert select(root, './/*[@id="property-content"]//p/text()') == [
        "Two bed apartment. AVAILABLE NOW",
        "Fully Furnished throughout",
        "Close to ",
    ]
    # images via data-image, exact class with internal double space (127)
    assert select(root, './/*[@class="property-image  zoom"]/@data-image') == [
        "/img/a.jpg", "/img/b.jpg",
    ]
    # rent string (129)
    assert select(root, './/*[@class="meta"]/text()') == ["£795 pcm"]
    # availability: string-value predicate then deep //text() (131)
    assert select(
        root, "//section[@id='property-content']//p[contains(.,'AVAILABLE')]//text()"
    ) == ["Two bed apartment. AVAILABLE NOW"]
    # furnished: text() node filter (139)
    assert select(
        root, '//section[@id="property-content"]//p//text()[contains(., "Furnished")]'
    ) == ["Fully Furnished throughout"]
    # features: span → parent h3 → following-sibling ul → li texts (143)
    feats = select(
        root,
        './/h3/span[contains(text(),"Features")]/../following-sibling::ul/li//text()',
    )
    assert [t.strip() for t in feats] == ["Parking", "Garden", "south facing"]
    # address: every text under the h1 (176)
    assert [t.strip() for t in select(root, "//h1[@class='title']//text()")] == [
        "12", "Kings Road", ", Newcastle",
    ]
    # map coordinates script (215)
    (js,) = select(root, './/script[contains(text(),"mapOptions")]/text()')
    assert "54.97" in js


NS_PAGE = """
<html><head><title> Big   House </title>
<!-- header: v2 -->
<meta name="description" content="  Nice   place  ">
</head><body>
<h1><span>
   </span><span>Villa  Aurora </span></h1>
<h2 class="a">first</h2>
<h2>second</h2>
<div id="x"><p>one</p></div>
<div id="y">plain</div>
<ul><li><a href="/1">l1</a></li><li>bare</li></ul>
<!-- price: 950 -->
</body></html>
"""


def test_normalize_space_and_flat_position():
    """Round-4 tier-3 subset: normalize-space() function + predicate,
    the parenthesized (path)[N] flat-position form, [*] / [tag] /
    [not(@a)] element predicates and the comment() node test — the
    remaining selector shapes the reference corpus uses (784 distinct
    selectors; 97.6% now compile, 99.3% occurrence-weighted)."""
    root = parse_html(NS_PAGE)
    # normalize-space(path): string value of the FIRST result,
    # whitespace-collapsed (XPath 1.0 §4.2)
    assert select(root, "normalize-space(//title/text())") == ["Big House"]
    assert select(root, "normalize-space(//h1)") == ["Villa Aurora"]
    assert select(root, 'normalize-space(//meta[@name="description"]/@content)') \
        == ["Nice place"]
    # empty node-set → '' (not no-result)
    assert select(root, "normalize-space(//h9/text())") == [""]
    # [normalize-space()] predicate drops whitespace-only text nodes:
    # the corpus's most common residual form //h1/span//text()[normalize-space()]
    assert select(root, "//h1/span//text()[normalize-space()]") == ["Villa  Aurora "]
    # (path)[N]: position over the FLAT document-order result list —
    # //h2[1] would take the first h2 per PARENT; (//h2)[1] takes one
    assert select(root, "(//h2/text())[1]") == ["first"]
    assert select(root, "(//h2)[last()]/text()") == ["second"]
    # composition seen in the corpus: normalize-space((//title//text())[1])
    assert select(root, "normalize-space((//title//text())[1])") == ["Big House"]
    # [*]: has at least one element child; [tag]: has that child
    assert select(root, "//div[*]/@id") == ["x"]
    assert select(root, "//div[p]/@id") == ["x"]
    assert select(root, "//li[a]/a/@href") == ["/1"]
    assert select(root, "//h2[not(@class)]/text()") == ["second"]
    # comment(): bodies are reachable, and never leak into text()
    assert select(root, "//comment()") == [" header: v2 ", " price: 950 "]
    assert select(root, "/html/head//comment()") == [" header: v2 "]
    body_text = parse_html(NS_PAGE).text()
    assert "price" not in body_text and "header" not in body_text


PRESIDENCE_PAGE = """
<html><body>
<div class="swiper-container">
  <div class="swiper-slide featured"><a href="/ficha/201">A</a></div>
  <div class="swiper-slide"><a href="/ficha/202">B</a></div>
</div>
<a class="next" href="/alquiler?page=2">&gt;</a>
<div id="etiqueta"><div><span>Alquilado</span></div></div>
<div class="headerLeft">
  <h1>Piso en Chamberí</h1>
  <p>Ref: <span>PR-0042</span></p>
</div>
<div class="detallesFicha"><ul>
  <li><b>Superficie Útil:</b>
     82 m² </li>
  <li><b>Habitaciones: </b> 3 </li>
  <li><b>Baños:</b> 2 </li>
  <li><b>Planta:</b> 4º </li>
  <li><b>Ascensor:</b> Sí </li>
  <li><b>Población:</b> Madrid </li>
  <li><b>Zona:</b> Chamberí </li>
  <li><b>Garaje:</b> Incluido </li>
  <li><b>Calificación energética (consumo):</b> NO </li>
  <li><b>Calificación energética (emisiones):</b> C </li>
</ul></div>
<p class="precio"><span>1.250 €/mes</span></p>
<div id="descripcionFicha2"><p>Bonito piso <b>reformado</b> en Chamberí.</p></div>
<div class="fotorama"><a href="/img/p1.jpg"></a><a href="/img/p2.jpg"></a></div>
<div id="mapa" data-lat="40.43" data-lng="-3.70"></div>
</body></html>
"""


def test_port_presidence_es_selector_set():
    """Fourth real-spider port: pyspiders-master
    spiders/presidence_es.py:49-160 verbatim — the corpus's heaviest
    normalize-space() user, plus OR-disjunction element predicates
    (with parens inside the quoted needles), chained text() predicates
    ([normalize-space()][.!=' NO ']), and string-value equality on a
    text() node filter."""
    root = parse_html(PRESIDENCE_PAGE)
    # listing loop (49) + pagination (53)
    assert select(
        root, "//div[contains(@class,'swiper-slide')]/a/@href"
    ) == ["/ficha/201", "/ficha/202"]
    assert select(root, "//a[@class='next']/@href") == ["/alquiler?page=2"]
    # rented gate (66): exact string-value match on the text node
    assert select(
        root, "//div[@id='etiqueta']//span/text()[.='Alquilado']"
    ) == ["Alquilado"]
    # title / external_id (74-75)
    assert select(root, "//div[@class='headerLeft']/h1/text()") \
        == ["Piso en Chamberí"]
    assert select(root, "//div[@class='headerLeft']/p/span/text()") \
        == ["PR-0042"]
    # square_meters (77): the li's own non-blank text node, not the <b>
    (sq,) = select(
        root,
        "//div[@class='detallesFicha']//li[contains(.,'Útil')]/text()[normalize-space()]",
    )
    assert sq.strip() == "82 m²"
    # rooms (87) — note the needle's trailing space survives Node.text()
    (room,) = select(
        root,
        "//div[@class='detallesFicha']//li[contains(.,'Habitaciones: ')]/text()[normalize-space()]",
    )
    assert room.strip() == "3"
    # rent (102): first text anywhere under the price paragraph
    assert select(root, "//p[@class='precio']//text()")[0] == "1.250 €/mes"
    # description (123): every text under the paragraph, joined
    assert "".join(
        select(root, "//div[@id='descripcionFicha2']/p//text()")
    ) == "Bonito piso reformado en Chamberí."
    # address (127): OR over two row labels, in document order
    addr = [t.strip() for t in select(
        root,
        "//div[@class='detallesFicha']//li[contains(.,'Población') or contains(.,'Zona') ]/text()[normalize-space()]",
    )]
    assert addr == ["Madrid", "Chamberí"]
    # parking (139): OR where only one branch matches
    (park,) = select(
        root,
        "//div[@class='detallesFicha']//li[contains(.,'Parking') or contains(.,'Garaje')]/text()[normalize-space()]",
    )
    assert park.strip() == "Incluido"
    # energy label (147): OR with parens inside the quoted needles +
    # chained text() predicates — the ' NO ' consumo row is skipped
    (label,) = select(
        root,
        "//div[@class='detallesFicha']//li[contains(.,'energética (consumo)') or contains(.,'energética (emisiones)')]/text()[normalize-space()][.!=' NO ']",
    )
    assert label.strip() == "C"
    # images (151) and map coordinates (159-160)
    assert select(root, "//div[@class='fotorama']//a/@href") \
        == ["/img/p1.jpg", "/img/p2.jpg"]
    assert select(root, "//div[@id='mapa']/@data-lat") == ["40.43"]
    assert select(root, "//div[@id='mapa']/@data-lng") == ["-3.70"]


WHB_PAGE = """
<html><head>
<meta name="viewport" content="width=device-width">
<title> 2 bed flat, Norwich </title>
</head><body>
<a class="property-image" href="/property/p1"></a>
<a class="property-image" href="/property/p2"></a>
<div id="renderbody-content">
  <!-- {"postcode": "NR1 1AA"} -->
  <!-- {"state": "let agreed"} -->
  <p>body</p>
</div>
<div title="Bedrooms"><span>2</span></div>
<div title="Bathrooms"><span>1</span></div>
<div class="price-container"><b class="price">£895</b>
  <i class="text-light text-muted">pcm</i></div>
<ul class="clear key-features"><li>Garden</li><li>Parking</li></ul>
<a class="phone-link" href="tel:01603111222">call</a>
<img class="brand-logo" alt="William H Brown">
<ul><li>2 Bathrooms</li><li>650 sqft</li></ul>
<div class="property-description">Spacious <b>flat</b>.</div>
<img itemprop="image" src="/img/w1.jpg">
<p>Reference: <span>WHB-042</span></p>
</body></html>
"""


def test_port_williamhbrown_selector_set():
    """Fifth real-spider port: pyspiders-master
    spiders/williamhbrown_co_uk.py:83-277 verbatim — the corpus's
    comment() user: structured data hidden in HTML comments is pulled
    with OR-contains predicates over comment bodies, plus sibling-axis
    title text and wildcard attribute lookups."""
    root = parse_html(WHB_PAGE)
    # listing loop (83)
    assert select(root, './/*[@class="property-image"]/@href') \
        == ["/property/p1", "/property/p2"]
    # presence gate (96): element-valued select
    assert len(select(root, './/*[@class="property-image"]')) == 2
    # structured data in comments (113)
    comments = select(root, './/*[@id="renderbody-content"]/comment()')
    assert len(comments) == 2 and "postcode" in comments[0]
    # address from a filtered comment (142)
    (addr,) = select(
        root,
        '//div[@id="renderbody-content"]//comment()'
        '[contains(., "postcode") or contains(., "state")][1]',
    )
    assert "NR1 1AA" in addr
    # room/bath/rent/period (117-122)
    assert select(root, './/*[@title="Bedrooms"]/span/text()') == ["2"]
    assert select(root, './/*[@title="Bathrooms"]/span/text()') == ["1"]
    assert select(
        root, './/*[@class="price-container"]/*[@class="price"]/text()'
    ) == ["£895"]
    assert select(
        root,
        './/*[@class="price-container"]/*[@class="text-light text-muted"]/text()',
    ) == ["pcm"]
    # contacts (129-130)
    assert select(root, './/*[@class="phone-link"]/@href') == ["tel:01603111222"]
    assert select(root, './/*[@class="brand-logo"]/@alt') == ["William H Brown"]
    # features (131)
    assert select(root, './/*[@class="clear key-features"]//li/text()') \
        == ["Garden", "Parking"]
    # title via following-sibling from the meta (185)
    (title,) = select(
        root, './/meta[@name="viewport"]/following-sibling::title/text()'
    )
    assert title.strip() == "2 bed flat, Norwich"
    # sqft row with OR (201)
    (sq,) = select(root, "//li[contains(.,'Sq') or contains(.,'sq')]//text()")
    assert sq == "650 sqft"
    # description + images + external id (267-277)
    assert "".join(
        select(root, './/*[contains(@class,"property-description")]//text()')
    ) == "Spacious flat."
    assert select(root, './/*[@itemprop="image"]/@src') == ["/img/w1.jpg"]
    assert select(root, './/*[contains(text(),"Reference")]/span/text()') \
        == ["WHB-042"]


GENOVAREAL_PAGE = """
<html><body>
<div class="gx-risultato"><a href="/immobile/501">…</a></div>
<div class="gx-risultato"><a href="/immobile/502">…</a></div>
<div class="gx-printable gx-scheda-testo"><h1>Trilocale in Via Roma</h1></div>
<h3 class="gx-printable-indirizzo gx-item">Via Roma 12, Genova</h3>
<ul>
  <li><span>Prezzo </span><span>1.200 €</span></li>
  <li><span>Superficie </span><span>80 mq</span></li>
</ul>
<ul>
  <li class="gx-row-details"><label>tipologia:</label><span>Appartamento</span></li>
  <li class="gx-row-details"><label>locali:</label><span>3</span></li>
  <li class="gx-row-details"><label>bagni:</label><span>2</span></li>
  <li class="gx-row-details"><label>spese condominiali:</label><span>50</span></li>
  <li class="gx-row-details"><label>piani:</label><span>4</span></li>
  <li class="gx-row-details"><label>classe energetica:</label><span>C</span></li>
  <li class="gx-row-details"><label>balconi:</label><span>0</span></li>
  <li class="gx-row-details"><label>ascensori:</label><span>1</span></li>
</ul>
<label>posti auto:</label> <label>terrazzi:</label>
<div class="descrizione-lunga">Luminoso <b>trilocale</b> ristrutturato.</div>
<div class="gx-gallery-slide" style="background-image:url(/img/g1.jpg)"></div>
<div class="gx-gallery-slide" style="background-image:url(/img/g2.jpg)"></div>
<div class="gx-printable-img gx-item gx-div-thumb-bottom" style="background-image:url(/img/plan.jpg)"></div>
</body></html>
"""


def test_port_genovareal_it_selector_set():
    """Sixth real-spider port: pyspiders-master
    spiders/genovareal_it.py:49-173 verbatim — the corpus's heaviest
    NESTED-predicate user ([label[contains(.,'x')]] /
    [span[contains(.,'x')]]), combined with flat-position groups,
    chained text() filters and //@style attribute harvesting."""
    root = parse_html(GENOVAREAL_PAGE)
    # listing loop (49)
    assert select(root, "//div[@class='gx-risultato']/a/@href") \
        == ["/immobile/501", "/immobile/502"]
    # property type (69): nested predicate + flat position
    assert select(
        root, "(//li[label[contains(.,'tipologia')]]/span/text())[1]"
    ) == ["Appartamento"]
    # title (74) and address (84)
    assert select(
        root, "//div[@class='gx-printable gx-scheda-testo']/h1/text()"
    ) == ["Trilocale in Via Roma"]
    assert select(
        root, "//h3[contains(@class,'gx-printable-indirizzo')]/text()"
    ) == ["Via Roma 12, Genova"]
    # rent (77) / square meters (123): nested span predicate, second span
    assert select(root, "//li[span[contains(.,'Prezzo')]]/span[2]/text()") \
        == ["1.200 €"]
    assert select(
        root, "//li[span[contains(.,'Superficie')]]/span[2]/text()"
    ) == ["80 mq"]
    # rooms (103) / bathrooms (119) / utilities (127) / floor (132)
    assert select(root, "(//li[label[contains(.,'locali')]]/span/text())[1]") \
        == ["3"]
    assert select(root, "(//li[label[contains(.,'bagni')]]/span/text())[1]") \
        == ["2"]
    assert select(root, "(//li[label[contains(.,'spese')]]/span/text())[1]") \
        == ["50"]
    assert select(root, "(//li[label[contains(.,'piani')]]/span/text())[1]") \
        == ["4"]
    # energy label (140): nested string-value equality
    assert select(
        root, "(//li[label[.='classe energetica:']]/span/text())[1]"
    ) == ["C"]
    # balcony (144): the '0' span is filtered by the chained [.!='0'] —
    # empty, exactly what the spider's if-None branch expects
    assert select(
        root, "(//li[label[contains(.,'balcon')]]/span/text()[.!='0'])[1]"
    ) == []
    # elevator (148): same shape, non-zero value survives
    assert select(
        root, "(//li[label[contains(.,'ascensori')]]/span/text()[.!='0'])[1]"
    ) == ["1"]
    # parking/terrace (151/154): whole-label string equality
    assert select(root, "//label[.='posti auto:']/text()") == ["posti auto:"]
    # description (136)
    assert "".join(
        select(root, "//div[contains(@class,'descrizione')]//text()")
    ) == "Luminoso trilocale ristrutturato."
    # gallery + floor plan (169/173): //@style harvesting
    assert [
        x.split("(")[1].split(")")[0]
        for x in select(root, "//div[@class='gx-gallery-slide']//@style")
    ] == ["/img/g1.jpg", "/img/g2.jpg"]
    assert [
        x.split("(")[1].split(")")[0] for x in select(
            root,
            "//div[@class='gx-printable-img gx-item gx-div-thumb-bottom']//@style",
        )
    ] == ["/img/plan.jpg"]
    # the spider's line 115 is malformed XPath (unbalanced paren) —
    # the engine rejects it at compile time instead of mis-reading it
    with pytest.raises(ValueError):
        XPathSelector(
            "normalize-space(//ul/li[@class='gx-row-details']"
            "/label[contains(.,'locali')]/following-sibling::span/text()"
        )


def test_tier5_forms():
    """r4 tier-5: the residual corpus forms — attribute-step
    predicates, not(), last()-N, no-space or, path comparisons,
    document-order axes, substring-after/-before, parent-recovery."""
    html = """
    <body>
    <div class="pagination"><a href="/1">1</a><a href="/2">2</a><a href="/3">3</a><a href="/n">»</a></div>
    <table><tr><th>Surface habitable (m²)</th><th>85</th></tr>
    <tr><td>Superficie habitable</td><td>70 m²</td></tr></table>
    <div class="container-xs"><a href="tel:+333">Call</a><a href="mailto:x@y">Mail</a></div>
    <iframe src="https://maps.example/embed"></iframe><iframe src="https://video.example/v"></iframe>
    <img class="img-dpe" src="/dpe/dpe_C.png"><img class="img-dpe" src="/img/empty.png">
    <link rel="shortlink" href="https://x.example/?p=991">
    <script>var m = L.marker([48.85, 2.35]);</script>
    <div><dt>Floor</dt><dd>3rd</dd></div>
    <img src="/garage.png"><ul><li><span class="critere-value">ok</span></li></ul>
    <td>Heizkosten:</td><td>120</td>
    <div id="desc"><h3>Header</h3></div>
    </body>"""
    root = parse_html(html)
    # last()-N
    assert select(
        root, "//div[contains(@class,'pagination')]/a[last()-1]/text()"
    ) == ["3"]
    # existential path = comparison
    assert select(root, "//tr[th='Surface habitable (m²)']/th[2]/text()") \
        == ["85"]
    # no-space 'or' + text() != filter with stray spaces
    assert select(
        root,
        "//tr[contains(.,'Superficie habitable')or contains( .,'Superficie' )]"
        "/td[2]/text()[ . !='0 m²']",
    ) == ["70 m²"]
    # @attr[preds] + parent:: owner-element recovery
    assert select(
        root,
        "//div[@class='container-xs']/a/@href[contains(.,'tel')]/parent::a/text()",
    ) == ["Call"]
    # @attr string predicates, positive and not()
    assert select(root, "//iframe/@src[contains(.,'map')]") \
        == ["https://maps.example/embed"]
    assert select(
        root, "//img[contains(@class,'img-dpe')]//@src[not(contains(.,'empty'))]"
    ) == ["/dpe/dpe_C.png"]
    # substring-after / -before, composed
    assert select(root, "substring-after(//link[@rel='shortlink']/@href,'=')") \
        == ["991"]
    assert select(
        root,
        "substring-before(substring-after(//link[@rel='shortlink']/@href,'?'),'991')",
    ) == ["p="]
    # bracket inside a quoted needle no longer breaks step splitting
    assert select(root, "//script[contains(.,'L.marker([')]/text()") \
        == ["var m = L.marker([48.85, 2.35]);"]
    # contains() over a nested path (string value of FIRST node)
    assert select(root, ".//div[contains(.//dt//text(), 'Floor')]/dd//text()") \
        == ["3rd"]
    # document-order axes
    assert select(
        root,
        "//ul/li/span[@class='critere-value']//preceding::img/@src[contains(.,'garage')]",
    ) == ["/garage.png"]
    assert select(root, "//td[contains(text(),'Heizkosten:')]/following::td/text()") \
        == ["120"]
    # parenthesized predicate + whitespace before the bracket
    assert select(root, './/*[(@id="desc")]/h3/text()') == ["Header"]
    assert select(root, "//div [@id='desc']/h3/text()") == ["Header"]
    # relative XPath without a leading axis marker routes to XPath
    assert is_xpath("div[@class='x']//a") and is_xpath("td//text()")
    tr = select(root, "//tr")[1]
    assert compile_selector("td//text()").select(tr) \
        == ["Superficie habitable", "70 m²"]
    # string() wrapper and redundant self step
    assert select(root, "normalize-space(string(.//div[@id='desc']))") \
        == ["Header"]
    assert select(root, ".//div[@id='desc']//.//h3/text()") == ["Header"]
