"""Tag-filter preparation (P9).

Ports ``prepareFilter`` (/root/reference/internal/crawler/util.go:52-72):
an empty tag list allows all tokens; otherwise only tokens whose tag name is
in the set pass. Names not in the HTML atom table are warned about and
dropped (util.go:64-66) — behaviorally identical to keeping them, since such
names never appear as token tags.
"""

from __future__ import annotations

import logging

log = logging.getLogger("crawley_spark")

# Standard HTML element names (x/net/html atom table tag subset — the names
# relevant to token matching; golang.org/x/net/html/atom/table.go).
HTML_TAGS = frozenset(
    """a abbr address area article aside audio b base bdi bdo blockquote body br
    button canvas caption cite code col colgroup data datalist dd del details
    dfn dialog div dl dt em embed fieldset figcaption figure footer form frame
    frameset h1 h2 h3 h4 h5 h6 head header hgroup hr html i iframe image img
    input ins kbd keygen label legend li link main malignmark map mark math
    menu menuitem meta meter nav nobr noembed noframes noscript object ol
    optgroup option output p param picture plaintext pre progress q rb rp rt
    rtc ruby s samp script section select slot small source span strike strong
    style sub summary sup svg table tbody td template textarea tfoot th thead
    time title tr track u ul var video wbr xmp annotation-xml center applet
    acronym basefont big blink button dir font foreignobject isindex listing
    marquee multicol nextid noindex spacer tt""".split()
)


def prepare_filter(tags) -> "callable":
    if not tags:
        return lambda tag: True
    allowed = set()
    for t in tags:
        if t in HTML_TAGS:
            allowed.add(t)
        else:
            log.warning("[!] invalid tag: `%s` skipping...", t)
    return lambda tag: tag in allowed
