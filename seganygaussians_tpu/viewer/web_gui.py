"""Browser-based interactive segmentation GUI (parity: `saga_gui.py:180-755`).

The reference's user-facing app is a dearpygui window with an orbit camera,
render-mode checkboxes (RGB / PCA / similarity / cluster), a scale slider,
click prompts, segment/roll-back buttons and a mask-save action.  The
TPU-era equivalent here is a zero-dependency web app: a stdlib
``http.server`` serving one HTML page (canvas + controls) and JSON/PNG
endpoints that drive the headless :class:`~.interactive.SagaSession`.  Every
widget of the reference GUI maps to an endpoint:

| saga_gui widget                   | endpoint             |
|-----------------------------------|----------------------|
| orbit drag / scroll zoom          | POST /orbit          |
| mode checkboxes (`:701-726`)      | GET /render?mode=... |
| scale slider (`:596-612`)         | POST /state          |
| left-click prompt (`:630-653`)    | POST /click          |
| segment3d button (`:662-688`)     | POST /segment        |
| roll-back / clear (`:447-472`)    | POST /undo, /clear   |
| save mask (`:690-699`)            | POST /save           |
| cluster_in_3D (`:518-544`)        | POST /cluster        |

Rendering is session-driven (JAX under the hood); the handler is
single-threaded so device work never races.
"""

from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>saga-tpu viewer</title><style>
body{font-family:sans-serif;background:#181818;color:#ddd;margin:0;display:flex}
#panel{width:260px;padding:12px}#panel div{margin:8px 0}
canvas{cursor:crosshair}button{margin:2px}
label{display:inline-block;width:90px}
</style></head><body>
<div><canvas id=c width=800 height=600></canvas></div>
<div id=panel>
 <div><label>mode</label>
  <select id=mode><option>rgb</option><option>pca</option>
  <option>similarity</option><option>cluster</option></select></div>
 <div><label>scale</label><input id=scale type=range min=0 max=1 step=0.01 value=0.5>
  <span id=scaleval>0.50</span></div>
 <div><label>threshold</label><input id=thr type=range min=0 max=1 step=0.01 value=0.75>
  <span id=thrval>0.75</span></div>
 <div><button id=segment>segment 3D</button><button id=undo>roll back</button></div>
 <div><button id=clear>clear prompts</button><button id=save>save mask</button></div>
 <div><button id=cluster>cluster in 3D</button></div>
 <div id=status>ready</div>
</div>
<script>
const c=document.getElementById('c'),ctx=c.getContext('2d');
let az=0,el=0,r=4,drag=null;
function refresh(){
 const m=document.getElementById('mode').value;
 const img=new Image();
 img.onload=()=>ctx.drawImage(img,0,0);
 img.src=`/render?mode=${m}&az=${az}&el=${el}&r=${r}&t=${Date.now()}`;
}
async function post(p,b){const res=await fetch(p,{method:'POST',body:JSON.stringify(b||{})});
 const j=await res.json();document.getElementById('status').textContent=j.status||'ok';
 refresh();return j;}
c.onmousedown=e=>{drag=[e.clientX,e.clientY,e.shiftKey]};
c.onmousemove=e=>{if(!drag)return;
 az+=(e.clientX-drag[0])*0.01;el+=(e.clientY-drag[1])*0.01;
 drag=[e.clientX,e.clientY,drag[2]];refresh();}
c.onmouseup=e=>{if(drag&&Math.abs(e.clientX-drag[0])<3){
 const rect=c.getBoundingClientRect();
 post('/click',{x:Math.round(e.clientX-rect.left),y:Math.round(e.clientY-rect.top),
  az:az,el:el,r:r});}
 drag=null;}
c.onwheel=e=>{e.preventDefault();r*=e.deltaY>0?1.1:0.9;refresh();}
document.getElementById('mode').onchange=refresh;
document.getElementById('scale').oninput=e=>{
 document.getElementById('scaleval').textContent=(+e.target.value).toFixed(2);
 post('/state',{scale:+e.target.value});};
document.getElementById('thr').oninput=e=>{
 document.getElementById('thrval').textContent=(+e.target.value).toFixed(2);
 post('/state',{threshold:+e.target.value});};
for(const id of ['segment','undo','clear','save','cluster'])
 document.getElementById(id).onclick=()=>post('/'+id);
refresh();
</script></body></html>"""


class WebGUI:
    """Serve a SagaSession over HTTP. ``session`` must provide the
    SagaSession surface (render_rgb/render_pca/render_similarity/
    render_cluster/click/segment3d/roll_back/clear_clicks/save_mask/
    cluster_in_3d, .orbit, .scale, .threshold)."""

    def __init__(self, session, host: str = "127.0.0.1", port: int = 8060):
        self.session = session
        self.host = host
        self.port = port
        self._httpd = None

    def _render_png(self, mode: str) -> bytes:
        s = self.session
        fn = {
            "rgb": s.render_rgb,
            "pca": s.render_pca,
            "similarity": lambda: _colorize(s.render_similarity()),
            "cluster": s.render_cluster,
        }[mode]
        img = np.asarray(fn())
        if img.ndim == 2:
            img = _colorize(img)
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            (np.clip(img, 0, 1) * 255).astype(np.uint8)
        ).save(buf, "PNG")
        return buf.getvalue()

    def make_handler(self):
        gui = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, obj, code=200):
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                u = urlparse(self.path)
                if u.path == "/":
                    body = _PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif u.path == "/render":
                    q = parse_qs(u.query)
                    s = gui.session
                    s.orbit.azimuth = float(q.get("az", [0])[0])
                    s.orbit.elevation = float(q.get("el", [0])[0])
                    s.orbit.radius = float(q.get("r", [4])[0])
                    png = gui._render_png(q.get("mode", ["rgb"])[0])
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Content-Length", str(len(png)))
                    self.end_headers()
                    self.wfile.write(png)
                elif u.path == "/state":
                    s = gui.session
                    self._json({
                        "scale": s.scale, "threshold": s.threshold,
                        "prompts": len(s.chosen_features),
                    })
                else:
                    self._json({"status": "not found"}, 404)

            def do_POST(self):
                length = int(self.headers.get("Content-Length") or 0)
                payload = json.loads(self.rfile.read(length) or b"{}")
                s = gui.session
                path = urlparse(self.path).path
                try:
                    if path == "/click":
                        s.orbit.azimuth = float(payload.get("az", s.orbit.azimuth))
                        s.orbit.elevation = float(payload.get("el", s.orbit.elevation))
                        s.orbit.radius = float(payload.get("r", s.orbit.radius))
                        s.click(int(payload["x"]), int(payload["y"]))
                        self._json({"status": f"{len(s.chosen_features)} prompts"})
                    elif path == "/state":
                        if "scale" in payload:
                            s.scale = float(payload["scale"])
                        if "threshold" in payload:
                            s.threshold = float(payload["threshold"])
                        self._json({"status": "state updated"})
                    elif path == "/segment":
                        mask = s.segment3d()
                        self._json({"status": f"segmented {int(np.asarray(mask).sum())} gaussians"})
                    elif path == "/undo":
                        s.roll_back()
                        self._json({"status": "rolled back"})
                    elif path == "/clear":
                        s.clear_clicks()
                        self._json({"status": "prompts cleared"})
                    elif path == "/save":
                        p = s.save_mask()
                        self._json({"status": f"saved {p}"})
                    elif path == "/cluster":
                        s.cluster_in_3d()
                        self._json({"status": "clustered"})
                    else:
                        self._json({"status": "not found"}, 404)
                except Exception as e:  # surface errors to the UI
                    self._json({"status": f"error: {e}"}, 500)

        return Handler

    def serve_forever(self):
        self._httpd = HTTPServer((self.host, self.port), self.make_handler())
        print(f"saga-tpu viewer at http://{self.host}:{self.port}", flush=True)
        self._httpd.serve_forever()

    def start_background(self):
        self._httpd = HTTPServer((self.host, self.port), self.make_handler())
        t = threading.Thread(target=self._httpd.serve_forever, daemon=True)
        t.start()
        return self._httpd.server_address

    def shutdown(self):
        if self._httpd is not None:
            self._httpd.shutdown()


def _colorize(score: np.ndarray) -> np.ndarray:
    """Score map → heat colors (the GUI's similarity overlay)."""
    s = np.clip(np.asarray(score), 0.0, 1.0)
    return np.stack([s, 0.2 + 0.3 * s, 1.0 - s], axis=-1)
