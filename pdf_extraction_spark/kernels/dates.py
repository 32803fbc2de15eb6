"""Filename/url date and quarter-FY parsing (F7/F8).

Ports of the reference date logic (rag_friendly_categorizer.py:81-114,
164-184) with one documented deviation: the reference falls back to
``datetime.now()`` when no pattern matches (nondeterministic); here the
fallback is ``None`` — in the pages table the authoritative timestamp is
``warc_ts``, which callers should coalesce onto.
"""

import re
from datetime import datetime

_MONTH_YEAR = re.compile(r"([A-Za-z]{3,9})_(\d{4})")
_QUARTER_FY = re.compile(r"Q(\d)_FY(\d{2,4})", re.IGNORECASE)
_YEAR = re.compile(r"(\d{4})")
_Q = re.compile(r"q(\d)")
_FY = re.compile(r"fy(\d{2,4})")

_QUARTER_START_MONTH = {1: 4, 2: 7, 3: 10, 4: 1}


def date_from_filename(filename: str):
    """Month_Year → first-of-month; Q#_FY## → fiscal-quarter start
    (April-March FY, Q4 lands in the next calendar year); bare YYYY →
    Jan 1; else None."""
    name = filename.rsplit("/", 1)[-1]
    if "." in name:
        name = name.rsplit(".", 1)[0]

    m = _MONTH_YEAR.search(name)
    if m:
        month_str, year = m.groups()
        try:
            month_num = datetime.strptime(month_str[:3], "%b").month
            return datetime(int(year), month_num, 1)
        except ValueError:
            pass

    m = _QUARTER_FY.search(name)
    if m:
        quarter, fy_year = m.groups()
        if len(fy_year) == 2:
            fy = int("20" + fy_year) if int(fy_year) < 50 else int("19" + fy_year)
        else:
            fy = int(fy_year)
        month = _QUARTER_START_MONTH[int(quarter)]
        year = fy if month != 1 else fy + 1
        return datetime(year, month, 1)

    m = _YEAR.search(name)
    if m:
        return datetime(int(m.group(1)), 1, 1)

    return None


def quarter_and_fy(filename: str, date):
    """(quarter, fiscal_year) strings; FY derived from the date when the
    name carries none (month ≥ April → next FY)."""
    name = filename.lower()

    m = _Q.search(name)
    quarter = f"Q{m.group(1)}" if m else ""

    m = _FY.search(name)
    if m:
        fy_year = m.group(1)
        fiscal_year = f"FY{fy_year}" if len(fy_year) == 2 else f"FY{fy_year[-2:]}"
    elif date is not None:
        if date.month >= 4:
            fiscal_year = f"FY{str(date.year + 1)[-2:]}"
        else:
            fiscal_year = f"FY{str(date.year)[-2:]}"
    else:
        fiscal_year = ""

    return quarter, fiscal_year
