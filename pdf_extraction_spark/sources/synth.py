"""Deterministic synthetic pages corpus (seed=42, no external data).

Shape per BASELINE.json input_hint:
``pages(url string, warc_ts timestamp, html binary, text string, lang string)``

Row *i* is a pure function of ``(seed, i)`` — generation is reproducible,
order-independent, and parallelizable (the bench generator fans rows out
across Spark tasks with ``mapInPandas`` over a range).

Content engineering (FIXTURES.md §1): ~70% HTML (templated page with
nav/header/footer boilerplate + transcript main content), ~30% PDF
(built via kernels.pdfio). Host distribution is deliberately skewed —
host0 owns ~30% of rows — to exercise salting/AQE. Transcript bodies
cycle through every reference regex branch: Moderator turns, TitleCase
speakers, invalid headers, continuation lines, curly quotes/dashes,
``Page N of M`` markers, admin/closing phrases, financial metric
sentences, MANAGEMENT rosters, Q&A cues, non-English rows.
"""

import random
from datetime import datetime, timedelta

from ..kernels.pdfio import build_minimal_pdf
from ..kernels.textstats import mix64

COMPANIES = ["CIPLA", "LUPIN", "ZYDEX", "MEDIGEN", "HELIX"]
N_HOSTS = 20
SKEW_HOST_SHARE = 0.30  # host0 owns ~30% of all rows

_FIRST = ["Rahul", "Priya", "Amit", "Sunita", "Vikram", "Neha", "Arjun", "Kavita",
          "Sanjay", "Meera", "David", "Laura", "Kenji", "Elena", "Marco"]
_LAST = ["Sharma", "Patel", "Gupta", "Iyer", "Khan", "Mehta", "Verma", "Rao",
         "Chen", "Garcia", "Muller", "Tanaka", "Rossi", "Dubois", "Novak"]

_FINANCIAL_SENTENCES = [
    "Revenue of Rs. {amt},{amt3} crores this quarter, with sales growth of {pct}%.",
    "Our income was $ {amt} million and EBITDA stands at Rs {amt2} crores for the period.",
    "EBITDA of INR {amt2} crores represents a {pct}% EBITDA margin overall.",
    "Turnover grew by {pct}% while gross margin of {pct2}% held steady year over year.",
    "We saw YoY growth of {pct}% and the business was up {pct2}% sequentially.",
    "Profit was down {pct2}% due to pricing pressure and higher input costs.",
    "Q{q} FY{fy} performance: net profit margin stands at {pct2}% for fiscal year {yr}-{yr2}.",
    "Operating margin of {pct2}% in Q{q}, with capex investment of Rs. {amt2} crores planned.",
]

_BUSINESS_SENTENCES = [
    "Our guidance and outlook for the next quarter remains positive as we expect continued expansion.",
    "The product pipeline includes new launches in the respiratory and oncology segments.",
    "We received regulatory approval from the FDA for our new facility and the inspection went well.",
    "Market share in the US market and Europe continues to improve across the portfolio.",
    "Supply chain efficiency and capacity utilization at the plant improved during the quarter.",
    "Competition and pricing pressure remain key risks alongside regulatory compliance uncertainty.",
    "The board declared a dividend and approved a share repurchase program this quarter.",
    "R&D investment in clinical trials for the biosimilar program is on track for development.",
]

_ADMIN_SENTENCES = [
    "Good day and welcome to the earnings conference call.",
    "This conference is being recorded for compliance purposes today.",
    "Ladies and gentlemen, please signal an operator if you need assistance at any time.",
    "Thank you and over to you sir.",
    "Before we begin, let me draw your attention to the forward-looking statements disclaimer.",
    "These estimates involve several risks and may differ materially from what is expressed.",
]

_CLOSING = [
    "Thank you for joining us today, have a good evening.",
    "Thank you so much for joining, any follow on questions can go to investor relations.",
]

_QA = [
    "My question is on the margin trajectory, could you answer the growth outlook part as well?",
    "Let me take that question and answer both parts in detail for the quarter.",
]

_NON_EN = {
    "es": "el informe de la empresa para el trimestre con los resultados y las cifras de ventas en la región",
    "de": "der Bericht der Firma für das Quartal mit den Ergebnissen und die Zahlen für den Umsatz im Markt",
    "hi": "कंपनी के तिमाही परिणाम और बिक्री के आंकड़े इस रिपोर्ट में है और यह जानकारी निवेशकों के लिए है",
}

_EPOCH = datetime(2016, 6, 1)
_SPAN_DAYS = (datetime(2025, 5, 1) - _EPOCH).days


def _rng(seed: int, i: int) -> random.Random:
    return random.Random(mix64((seed << 32) ^ i))


def _transcript_lines(rng: random.Random, company: str, q: int, fy: int):
    """Dialogue lines for one synthetic earnings call."""
    lines = []
    n_speakers = rng.randint(2, 5)
    speakers = []
    roster_bits = []
    for s in range(n_speakers):
        fn, ln = rng.choice(_FIRST), rng.choice(_LAST)
        role = rng.choice(["CEO", "CFO", "MANAGING DIRECTOR", "CHIEF OPERATING OFFICER"])
        speakers.append(f"{fn} {ln}")
        title = rng.choice(["MR.", "MS.", "DR."])
        roster_bits.append(f"{title} {fn.upper()} {ln.upper()} – {role}")

    lines.append("Moderator: " + rng.choice(_ADMIN_SENTENCES))
    lines.append("MANAGEMENT: " + ", ".join(roster_bits))

    def fin_sentence():
        t = rng.choice(_FINANCIAL_SENTENCES)
        return t.format(
            amt=rng.randint(100, 999),
            amt2=rng.randint(100, 9999),
            amt3=rng.randint(100, 999),
            pct=round(rng.uniform(1, 40), 1),
            pct2=round(rng.uniform(1, 40), 1),
            q=q,
            fy=fy % 100,
            yr=2000 + fy - 1,
            yr2=fy % 100,
        )

    n_turns = rng.randint(4, 10)
    for t in range(n_turns):
        speaker = rng.choice(speakers)
        parts = [fin_sentence() if rng.random() < 0.6 else rng.choice(_BUSINESS_SENTENCES)]
        for _ in range(rng.randint(0, 3)):
            parts.append(rng.choice(_BUSINESS_SENTENCES + _QA))
        # occasional decorations exercising the cleaner: curly punctuation,
        # page markers, space runs
        body = " ".join(parts)
        if rng.random() < 0.3:
            body = body.replace("the", "the", 1) + " “quoted – remark” it’s noted."
        lines.append(f"{speaker}: {body}")
        if rng.random() < 0.25:
            lines.append("continuation line of the same turn with more detail on volume and capacity")
        if rng.random() < 0.15:
            lines.append(f"Page {rng.randint(1, 9)} of {rng.randint(10, 30)}")
        if rng.random() < 0.2:
            lines.append("Operator: Next question please from the analyst line.")  # invalid speaker header
        if rng.random() < 0.2:
            lines.append("Moderator: " + rng.choice(_QA))
    lines.append("Moderator: " + rng.choice(_CLOSING))
    return lines


def _html_page(rng: random.Random, title: str, content_lines):
    nav = " ".join(
        f'<a href="/{w}">{w.capitalize()}</a>' for w in ["home", "about", "investors", "news", "contact"]
    )
    paras = "\n".join(f"<p>{ln}</p>" for ln in content_lines)
    related = " ".join(f'<a href="/r{k}">Related article {k} read more here</a>' for k in range(3))
    return (
        "<html><head><title>"
        + title
        + '</title><style>p{margin:0}</style><script>var x=1;</script></head><body>'
        + f"<header><nav>{nav}</nav></header>"
        + f'<div class="main"><h1>{title}</h1>\n{paras}</div>'
        + f'<aside>{related}</aside>'
        + "<footer><p>Copyright 2025. All rights reserved. Privacy terms sitemap careers legal.</p></footer>"
        + "</body></html>"
    )


def synth_page_row(i: int, seed: int = 42):
    """Row i of the synthetic pages table — pure function of (seed, i)."""
    rng = _rng(seed, i)

    # skewed host assignment: first SKEW share → host0
    host = 0 if rng.random() < SKEW_HOST_SHARE else rng.randint(1, N_HOSTS - 1)
    company = rng.choice(COMPANIES)
    q = rng.randint(1, 4)
    fy = rng.randint(17, 25)
    warc_ts = _EPOCH + timedelta(
        days=int(rng.random() * _SPAN_DAYS), seconds=rng.randint(0, 86399)
    )

    lang = "en"
    r = rng.random()
    if r < 0.08:
        lang = rng.choice(sorted(_NON_EN))

    name_style = rng.random()
    if name_style < 0.4:
        docname = f"Earnings_Call_Q{q}_FY{fy}"
    elif name_style < 0.7:
        mon = rng.choice(["Jan", "Feb", "Mar", "Apr", "May", "Aug", "Sep", "Nov"])
        docname = f"{mon}_{2000 + fy}_Transcript"
    else:
        docname = f"Call_{2000 + fy}"

    is_pdf = rng.random() < 0.30
    if lang != "en":
        content_lines = [f"Texto: {_NON_EN[lang]}" if lang == "es" else _NON_EN[lang]] * 3
    else:
        content_lines = _transcript_lines(rng, company, q, fy)

    if is_pdf:
        # paginate ~12 lines per page
        pages = [
            "\n".join(content_lines[k : k + 12]) for k in range(0, len(content_lines), 12)
        ]
        payload = build_minimal_pdf(pages)
        ext = "pdf"
    else:
        payload = _html_page(rng, f"{company} {docname}", content_lines).encode("utf-8")
        ext = "html"

    url = f"https://host{host}.example/{company.lower()}/{docname}_{i}.{ext}"
    return {
        "url": url,
        "warc_ts": warc_ts,
        "html": payload,
        "text": None,  # pipeline fills extracted text
        "lang": lang,
    }


def synth_pages_pandas(start: int, end: int, seed: int = 42):
    """Rows [start, end) as a pandas DataFrame (used by mapInPandas fanout)."""
    import pandas as pd

    rows = [synth_page_row(i, seed) for i in range(start, end)]
    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang"]
    )


def write_pages_parquet(path: str, n_rows: int, seed: int = 42, row_group_size: int = 512):
    """Write the pages table straight to parquet via pyarrow (driver-free
    of Spark; used to materialize test/bench fixtures once)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    batches = []
    for lo in range(0, n_rows, row_group_size):
        df = synth_pages_pandas(lo, min(lo + row_group_size, n_rows), seed)
        batches.append(pa.RecordBatch.from_pandas(df, schema=schema, preserve_index=False))
    table = pa.Table.from_batches(batches, schema=schema)
    pq.write_table(table, path, row_group_size=row_group_size)
    return path
