// Foreign-codec fixture generator for the native JPEG/PNG kernels.
//
// javax.imageio is an independent, public implementation of T.81 (JPEG,
// including the Annex-G progressive scan wire format) and RFC 2083 PNG
// (including Adam7 interlacing on the read side). The repo's pure-numpy
// codecs (operators/jpeg.py, operators/png.py) were previously validated
// only by self-roundtrip + a shared baseline kernel, so a *symmetric*
// misunderstanding of the spec (e.g. EOBRUN or refinement-bit encoding)
// would decode the repo's own files fine and every foreign file wrong.
// This tool closes that gap in both directions:
//
//   encode : BMP -> progressive (or baseline) JPEG via ImageIO
//            -> a FOREIGN bitstream the native decoder must read.
//   decode : any ImageIO-readable file -> raw RGB dump
//            -> a FOREIGN pixel reading of the native encoders' output.
//
// Usage:
//   java ForeignCodec.java encode <in.bmp> <out.jpg> <quality 0..1> <prog 0|1>
//                          [sampling 420|444]
//   java ForeignCodec.java decode <in.(jpg|png|bmp)> <out.raw>
//
// sampling=444 rewrites the writer's default metadata tree so every
// component gets 1x1 sampling factors — no chroma upsampling on decode,
// which lets the pixel comparison be tight (IDCT rounding only). The
// default 420 keeps ImageIO's 2x2 luma MCUs, which is the geometry that
// exercises interleaved progressive DC scans.
//
// Raw dump layout: big-endian int32 width, int32 height, then
// height*width*3 bytes of RGB (row-major). Deterministic for a given
// input file, so the dumps are committable test fixtures.

import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageTypeSpecifier;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.metadata.IIOMetadata;
import javax.imageio.metadata.IIOMetadataNode;
import javax.imageio.stream.ImageOutputStream;
import java.awt.image.BufferedImage;
import java.io.BufferedOutputStream;
import java.io.DataOutputStream;
import java.io.File;
import java.io.FileOutputStream;
import java.util.Iterator;
import org.w3c.dom.NodeList;

public class ForeignCodec {
    public static void main(String[] args) throws Exception {
        if (args[0].equals("encode")) {
            BufferedImage src = ImageIO.read(new File(args[1]));
            if (src == null) throw new RuntimeException("unreadable: " + args[1]);
            BufferedImage rgb = new BufferedImage(
                    src.getWidth(), src.getHeight(), BufferedImage.TYPE_3BYTE_BGR);
            rgb.getGraphics().drawImage(src, 0, 0, null);
            Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("jpeg");
            ImageWriter w = it.next();
            ImageWriteParam p = w.getDefaultWriteParam();
            p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
            p.setCompressionQuality(Float.parseFloat(args[3]));
            p.setProgressiveMode(args[4].equals("1")
                    ? ImageWriteParam.MODE_DEFAULT : ImageWriteParam.MODE_DISABLED);
            IIOMetadata meta = null;
            if (args.length > 5 && args[5].equals("444")) {
                ImageTypeSpecifier type =
                        ImageTypeSpecifier.createFromRenderedImage(rgb);
                meta = w.getDefaultImageMetadata(type, p);
                String fmt = "javax_imageio_jpeg_image_1.0";
                IIOMetadataNode root = (IIOMetadataNode) meta.getAsTree(fmt);
                NodeList comps = root.getElementsByTagName("componentSpec");
                if (comps.getLength() == 0)
                    throw new RuntimeException("no componentSpec in metadata");
                for (int i = 0; i < comps.getLength(); i++) {
                    IIOMetadataNode c = (IIOMetadataNode) comps.item(i);
                    c.setAttribute("HsamplingFactor", "1");
                    c.setAttribute("VsamplingFactor", "1");
                }
                meta.setFromTree(fmt, root);
            }
            try (ImageOutputStream os =
                         ImageIO.createImageOutputStream(new File(args[2]))) {
                w.setOutput(os);
                w.write(null, new IIOImage(rgb, null, meta), p);
            }
            w.dispose();
        } else if (args[0].equals("decode")) {
            BufferedImage img = ImageIO.read(new File(args[1]));
            if (img == null) throw new RuntimeException("unreadable: " + args[1]);
            int w = img.getWidth(), h = img.getHeight();
            try (DataOutputStream os = new DataOutputStream(
                    new BufferedOutputStream(new FileOutputStream(args[2])))) {
                os.writeInt(w);
                os.writeInt(h);
                for (int y = 0; y < h; y++) {
                    for (int x = 0; x < w; x++) {
                        int px = img.getRGB(x, y);
                        os.writeByte((px >> 16) & 0xff);
                        os.writeByte((px >> 8) & 0xff);
                        os.writeByte(px & 0xff);
                    }
                }
            }
        } else {
            throw new RuntimeException("unknown command: " + args[0]);
        }
    }
}
