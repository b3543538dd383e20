"""Navigation algebra + suggested actions (SURVEY.md §2.8 F7/F8).

The reference's ~400-LoC ``navigate_document`` (app.py:1440-1842) is a
stateful cursor over the per-page structure tree with clamped
next/previous/goto for each axis (page app.py:1500-1505, paragraph
app.py:1637-1642, sentence app.py:1721-1726, column app.py:1789-1795).
In the engine the structure is materialized as nested Arrow columns, so
navigation is pure O(1) indexing — provided here as a thin view helper for
API parity and exercised by the span-consistency tests.
"""

from __future__ import annotations


def clamp_index(index: int, total: int) -> int:
    """F7 — clamp a navigation index into [0, total-1] (app.py:1500-1505).

    The reference applies ``max(0, min(index, total - 1))`` on every
    next/previous/goto; an empty axis (total == 0) pins to 0.
    """
    if total <= 0:
        return 0
    return max(0, min(index, total - 1))


def navigate(total: int, current: int, action: str, target: int | None = None) -> int:
    """One navigation step on one axis with the reference's clamping.

    action ∈ {'next', 'previous', 'goto'}; 'goto' uses ``target``
    (app.py:1487-1567 shows the same three-way branch per axis).
    """
    if action == "next":
        return clamp_index(current + 1, total)
    if action == "previous":
        return clamp_index(current - 1, total)
    if action == "goto":
        return clamp_index(target if target is not None else current, total)
    raise ValueError(f"unknown navigation action: {action!r}")


def suggested_actions(num_paragraphs: int, num_columns: int, total_sentences: int) -> list[dict]:
    """F8 — suggested-actions rule (app.py:980-1007), exact order and wording."""
    actions: list[dict] = []
    if num_paragraphs > 1:
        actions.append({"type": "read_by_paragraph", "description": "Read paragraph by paragraph"})
    if num_columns > 1:
        actions.append({"type": "read_by_column", "description": "Read column by column"})
    if total_sentences > 5:
        actions.append({"type": "summarize", "description": "Read summary of text"})
    actions.append({"type": "read_full", "description": "Read full text"})
    return actions


class NavigationView:
    """Read-only cursor over one extracted row's nested structure columns.

    ``paragraphs`` is the engine's list<struct> column value for one row:
    ``[{"id", "bounds", "text", "column", "sentences": [{"id","text"}]}]``.
    Replaces the reference's SESSION_CACHE 'current' cursor
    (app.py:264-271) — state lives in this view object, data in the row.
    """

    def __init__(self, paragraphs, columns):
        # accept list / numpy object array / arrow-scalar conversions, and
        # normalize nested sequences to plain lists
        self.paragraphs = []
        for p in (paragraphs if paragraphs is not None else []):
            p = dict(p)
            p["sentences"] = [dict(s) for s in (p.get("sentences") if p.get("sentences") is not None else [])]
            self.paragraphs.append(p)
        self.columns = []
        for c in (columns if columns is not None else []):
            c = dict(c)
            c["paragraphs"] = list(c.get("paragraphs") if c.get("paragraphs") is not None else [])
            self.columns.append(c)
        self.cursor = {"paragraph": 0, "sentence": 0, "column": 0}

    def step(self, axis: str, action: str, target: int | None = None) -> dict:
        if axis == "paragraph":
            total = len(self.paragraphs)
            self.cursor["paragraph"] = navigate(total, self.cursor["paragraph"], action, target)
            self.cursor["sentence"] = 0
        elif axis == "sentence":
            para = self.paragraphs[self.cursor["paragraph"]] if self.paragraphs else {"sentences": []}
            total = len(para["sentences"])
            self.cursor["sentence"] = navigate(total, self.cursor["sentence"], action, target)
        elif axis == "column":
            total = len(self.columns)
            self.cursor["column"] = navigate(total, self.cursor["column"], action, target)
        else:
            raise ValueError(f"unknown navigation axis: {axis!r}")
        return dict(self.cursor)

    def current_text(self, axis: str) -> str:
        if not self.paragraphs:
            return ""
        if axis == "paragraph":
            return self.paragraphs[self.cursor["paragraph"]]["text"]
        if axis == "sentence":
            sentences = self.paragraphs[self.cursor["paragraph"]]["sentences"]
            if not sentences:
                return ""
            return sentences[min(self.cursor["sentence"], len(sentences) - 1)]["text"]
        if axis == "column":
            if not self.columns:
                return ""
            col = self.columns[self.cursor["column"]]
            ids = col["paragraphs"]
            # column-scope text = that column's paragraph texts joined with
            # blank lines (app.py:1996-2005 summarize-by-column selection)
            by_id = {p["id"]: p for p in self.paragraphs}
            return "\n\n".join(by_id[i]["text"] for i in ids if i in by_id)
        raise ValueError(f"unknown navigation axis: {axis!r}")


def scope_text(paragraphs, columns, scope: str, index: int = 0) -> str:
    """Summarize-scope text selection (app.py:1893-2011).

    'full' → all paragraph texts joined with blank lines (app.py:1905-1906);
    'paragraph' → paragraphs[index] text (clamped, app.py:1950-1960);
    'column' → that column's paragraph texts joined (app.py:1996-2005).
    The reference's 'page' scope addresses one page of a multi-page doc —
    in the engine that is a per-page row (pages_ops.explode_pdf_pages), so
    page scope is row selection, not an in-row walk.
    """
    view = NavigationView(paragraphs, columns)
    if scope == "full":
        return "\n\n".join(p["text"] for p in view.paragraphs)
    if scope == "paragraph":
        if not view.paragraphs:
            return ""
        return view.paragraphs[clamp_index(index, len(view.paragraphs))]["text"]
    if scope == "column":
        if not view.columns:
            return ""
        view.cursor["column"] = clamp_index(index, len(view.columns))
        return view.current_text("column")
    raise ValueError(f"unknown summarize scope: {scope!r}")
