"""Generate the static HTML documentation site (docs/site/) from the
markdown sources: README.md, docs/guide/*.md, docs/api/*.md.

The reference ships a Sphinx site deployed to GitHub Pages
(reference: docs/source/, .github/workflows/static.yml); this repo's
equivalent is dependency-light (python-markdown, which is available
everywhere) and fully offline: ``python docs/gen_site.py`` regenerates
docs/site/ from scratch.
"""

import html
import os
import re

import markdown

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
OUT = os.path.join(HERE, "site")

CSS = """
:root { --fg:#1c1e21; --bg:#ffffff; --accent:#0b5fff; --dim:#667; --code:#f5f6f8; }
@media (prefers-color-scheme: dark) {
  :root { --fg:#e6e6e6; --bg:#14161a; --accent:#6ea8ff; --dim:#9aa; --code:#1e2228; }
}
* { box-sizing: border-box; }
body { margin:0; font:16px/1.55 system-ui,-apple-system,Segoe UI,sans-serif;
       color:var(--fg); background:var(--bg); }
.layout { display:flex; min-height:100vh; }
nav { width:260px; flex:none; padding:20px 16px; border-right:1px solid #8884;
      position:sticky; top:0; height:100vh; overflow-y:auto; font-size:14px; }
nav h1 { font-size:16px; margin:0 0 12px; }
nav h2 { font-size:11px; text-transform:uppercase; letter-spacing:.08em;
         color:var(--dim); margin:16px 0 4px; }
nav a { display:block; color:var(--fg); text-decoration:none; padding:2px 6px;
        border-radius:4px; }
nav a:hover { background:#8882; }
nav a.current { color:var(--accent); font-weight:600; }
main { flex:1; min-width:0; padding:28px 40px 80px; max-width:900px; }
main h1,h2,h3 { line-height:1.25; }
main a { color:var(--accent); }
pre { background:var(--code); padding:12px 14px; border-radius:8px;
      overflow-x:auto; font-size:13.5px; }
code { background:var(--code); padding:1px 4px; border-radius:4px;
       font-size:.92em; }
pre code { background:none; padding:0; }
table { border-collapse:collapse; display:block; overflow-x:auto; }
th,td { border:1px solid #8884; padding:5px 10px; text-align:left;
        vertical-align:top; }
th { background:var(--code); }
blockquote { border-left:3px solid var(--accent); margin:0; padding:2px 14px;
             color:var(--dim); }
@media (max-width: 800px) { .layout{flex-direction:column}
  nav{width:auto;height:auto;position:static} }
"""

PAGE = """<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — PSSR2-TPU</title>
<style>{css}</style></head>
<body><div class="layout">
<nav>
<h1><a href="index.html" style="padding:0">PSSR2-TPU</a></h1>
{nav}
</nav>
<main>
{body}
</main>
</div></body></html>
"""


def _title_of(md_text, fallback):
    m = re.search(r"^#\s+(.+)$", md_text, re.M)
    return m.group(1).strip().strip("`") if m else fallback


def _fix_links(body):
    # intra-site links: guide/api cross-references written as .md paths
    body = re.sub(r'href="(?:\.\./)?(?:docs/)?guide/([\w\-]+)\.md"', r'href="guide_\1.html"', body)
    body = re.sub(r'href="(?:\.\./)?(?:docs/)?api/([\w\-]+)\.md"', r'href="api_\1.html"', body)
    body = re.sub(r'href="([\w\-]+)\.md"', r'href="guide_\1.html"', body)
    return body


def main():
    os.makedirs(OUT, exist_ok=True)
    pages = []  # (out_name, section, title, md_path)

    pages.append(("index.html", "", "Overview", os.path.join(ROOT, "README.md")))
    guide_dir = os.path.join(HERE, "guide")
    order = ["start", "principles", "workflow", "training", "prediction",
             "dataloading", "tpu", "migrating", "napari"]
    names = sorted(
        (n[:-3] for n in os.listdir(guide_dir) if n.endswith(".md")),
        key=lambda n: (order.index(n) if n in order else 99, n),
    )
    for n in names:
        pages.append((f"guide_{n}.html", "Guide", None, os.path.join(guide_dir, f"{n}.md")))
    api_dir = os.path.join(HERE, "api")
    for n in sorted(n[:-3] for n in os.listdir(api_dir) if n.endswith(".md")):
        pages.append((f"api_{n}.html", "API", None, os.path.join(api_dir, f"{n}.md")))

    # resolve titles
    resolved = []
    for out_name, section, title, path in pages:
        text = open(path, encoding="utf-8").read()
        resolved.append((out_name, section, title or _title_of(text, out_name), text))

    md = markdown.Markdown(extensions=["tables", "fenced_code"])
    for out_name, section, title, text in resolved:
        nav_parts, cur = [], ""
        for o, s, t, _ in resolved:
            if s != cur:
                cur = s
                if s:
                    nav_parts.append(f"<h2>{html.escape(s)}</h2>")
            cls = ' class="current"' if o == out_name else ""
            nav_parts.append(f'<a href="{o}"{cls}>{html.escape(t)}</a>')
        md.reset()
        body = _fix_links(md.convert(text))
        with open(os.path.join(OUT, out_name), "w", encoding="utf-8") as f:
            f.write(PAGE.format(title=html.escape(title), css=CSS,
                                nav="\n".join(nav_parts), body=body))
    print(f"wrote {len(resolved)} pages to {OUT}")


if __name__ == "__main__":
    main()
